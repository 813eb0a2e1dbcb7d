"""Resize kernels vs torch F.interpolate / cv2-style nearest semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from deep_spectral_tpu.ops.resize import resize_bilinear, resize_bicubic, resize_nearest


def test_bilinear_matches_torch_upsample(rng):
    x = rng.standard_normal((2, 7, 9, 5)).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(x), (13, 20)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=(13, 20), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilinear_matches_torch_downsample(rng):
    x = rng.standard_normal((1, 16, 12, 3)).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(x), (5, 7)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=(5, 7), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bicubic_matches_torch(rng):
    x = rng.standard_normal((1, 14, 14, 8)).astype(np.float32)
    out = np.asarray(resize_bicubic(jnp.asarray(x), (23, 31)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=(23, 31), mode="bicubic", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_nearest_matches_cv2_convention(rng):
    import cv2
    x = (rng.random((11, 13)) * 20).astype(np.uint8)
    out = np.asarray(resize_nearest(jnp.asarray(x.astype(np.int32)), (37, 41)))
    ref = cv2.resize(x, dsize=(41, 37), interpolation=cv2.INTER_NEAREST).astype(np.int32)
    np.testing.assert_array_equal(out, ref)


def test_nearest_downsample_matches_cv2(rng):
    import cv2
    x = (rng.random((40, 48)) * 20).astype(np.uint8)
    out = np.asarray(resize_nearest(jnp.asarray(x.astype(np.int32)), (13, 9)))
    ref = cv2.resize(x, dsize=(9, 13), interpolation=cv2.INTER_NEAREST).astype(np.int32)
    np.testing.assert_array_equal(out, ref)


def test_bilinear_mm_matches_gather_and_grad(rng):
    """The matmul-form upsample (train-time logits path, models/deeplab.py)
    must equal the gather form in values AND in gradients (its whole point is
    a better TPU program for the same math; on CPU f32 both are exact)."""
    from deep_spectral_tpu.ops.resize import resize_bilinear, resize_bilinear_mm
    x = jnp.asarray(rng.standard_normal((3, 14, 14, 21)).astype(np.float32))
    up_g = resize_bilinear(x, (224, 224))
    up_m = resize_bilinear_mm(x, (224, 224))
    np.testing.assert_allclose(np.asarray(up_m), np.asarray(up_g),
                               rtol=1e-6, atol=1e-6)
    # Non-integer ratios + edge clamp (torch half-pixel semantics).
    y = jnp.asarray(rng.standard_normal((2, 9, 13, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(resize_bilinear_mm(y, (25, 31))),
                               np.asarray(resize_bilinear(y, (25, 31))),
                               rtol=1e-6, atol=1e-6)
    # Gradients: d/dx sum(f(x) * t) for a fixed tangent t.
    t = jnp.asarray(rng.standard_normal((3, 224, 224, 21)).astype(np.float32))
    g_g = jax.grad(lambda a: jnp.vdot(resize_bilinear(a, (224, 224)), t))(x)
    g_m = jax.grad(lambda a: jnp.vdot(resize_bilinear_mm(a, (224, 224)), t))(x)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g),
                               rtol=1e-5, atol=1e-5)
