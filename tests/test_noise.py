"""Diffusion-noise schedule parity vs the reference formula
(vcd_utils/vcd_add_noise.py:3-28), oracle recomputed in torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from llava_align_tpu.ops.noise import add_diffusion_noise, diffusion_schedule


def _torch_schedule():
    betas = torch.linspace(-6, 6, 1000)
    betas = torch.sigmoid(betas) * (0.5e-2 - 1e-5) + 1e-5
    alphas_prod = torch.cumprod(1 - betas, dim=0)
    return torch.sqrt(alphas_prod).numpy(), torch.sqrt(1 - alphas_prod).numpy()


def test_schedule_matches_torch_reference():
    a_ref, b_ref = _torch_schedule()
    a, b = diffusion_schedule()
    # fp32 linspace/cumprod rounding differs slightly between torch and numpy;
    # 1e-5 is far below any behavioral effect of a noise schedule.
    np.testing.assert_allclose(a, a_ref, rtol=0, atol=1e-5)
    np.testing.assert_allclose(b, b_ref, rtol=0, atol=1e-5)


def test_closed_form_mixture():
    a, b = diffusion_schedule()
    img = jnp.ones((3, 8, 8), jnp.float32) * 0.5
    rng = jax.random.PRNGKey(0)
    out = add_diffusion_noise(img, rng, 500)
    eps = jax.random.normal(rng, img.shape, jnp.float32)
    expected = a[500] * img + b[500] * eps
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_step_999_is_nearly_pure_noise():
    a, b = diffusion_schedule()
    assert a[999] < 0.35 and b[999] > 0.93  # signal mostly destroyed
    img = jnp.full((3, 64, 64), 1.0, jnp.float32)
    out = add_diffusion_noise(img, jax.random.PRNGKey(1), 999)
    # output should look ~N(a_999, b_999)
    assert abs(float(out.mean()) - float(a[999])) < 0.05
    assert abs(float(out.std()) - float(b[999])) < 0.05


def test_step_0_is_nearly_identity():
    a, b = diffusion_schedule()
    assert a[0] > 0.9999 and b[0] < 0.005


def test_traced_noise_step_no_recompile():
    img = jnp.zeros((3, 4, 4), jnp.float32)
    rng = jax.random.PRNGKey(0)
    o1 = add_diffusion_noise(img, rng, jnp.int32(100))
    o2 = add_diffusion_noise(img, rng, jnp.int32(900))
    assert float(jnp.abs(o1).mean()) < float(jnp.abs(o2).mean())


def test_dtype_preserved():
    img = jnp.zeros((3, 4, 4), jnp.bfloat16)
    out = add_diffusion_noise(img, jax.random.PRNGKey(0), 10)
    assert out.dtype == jnp.bfloat16
