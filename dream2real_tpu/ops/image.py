"""Image ops in pure JAX, replacing the reference's cv2/torchvision calls.

- erode/dilate (cv2.erode/dilate with all-ones kernels: data_loader.py:108-109,
  physics_utils.py:77-83) via lax.reduce_window min/max;
- center-crop + resize (combined_rendering.py:166-209 rectify_depth/mask) via
  jax.image.resize;
- gaussian blur (torchvision gaussian_blur in
  vision_3d/geometry_utils.py:262) as an explicit separable conv so the kernel
  matches torchvision bit-for-bit;
- linear<->sRGB (instant-ngp's linear_to_srgb used at
  combined_rendering.py:150).

Everything here is elementwise/windowed VPU work that XLA fuses into adjacent
kernels; no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def erode(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary/greyscale erosion with an all-ones square kernel (cv2.erode).

    mask: (..., H, W). Border handled like cv2 (values outside are +inf for
    erosion, i.e. borders keep their min over in-bounds pixels).
    """
    n_batch = mask.ndim - 2
    window = (1,) * n_batch + (kernel_size, kernel_size)
    return jax.lax.reduce_window(
        mask,
        jnp.array(jnp.inf, mask.dtype) if jnp.issubdtype(mask.dtype, jnp.floating)
        else jnp.iinfo(mask.dtype).max if jnp.issubdtype(mask.dtype, jnp.integer)
        else jnp.array(True),
        jax.lax.min,
        window,
        (1,) * mask.ndim,
        "SAME",
    )


def dilate(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary/greyscale dilation with an all-ones square kernel (cv2.dilate)."""
    n_batch = mask.ndim - 2
    window = (1,) * n_batch + (kernel_size, kernel_size)
    return jax.lax.reduce_window(
        mask,
        jnp.array(-jnp.inf, mask.dtype) if jnp.issubdtype(mask.dtype, jnp.floating)
        else jnp.iinfo(mask.dtype).min if jnp.issubdtype(mask.dtype, jnp.integer)
        else jnp.array(False),
        jax.lax.max,
        window,
        (1,) * mask.ndim,
        "SAME",
    )


def center_crop_square(img: jnp.ndarray) -> jnp.ndarray:
    """Center-crop (H, W, ...) to a square of side min(H, W).

    Parity: combined_rendering.py:176-180 (rectify_depth center crop).
    """
    h, w = img.shape[0], img.shape[1]
    if h > w:
        start = (h - w) // 2
        return img[start : start + w]
    start = (w - h) // 2
    return img[:, start : start + h]


def _cv2_cubic_weight(x, a: float = -0.75):
    """cv2's bicubic kernel (BiCubic with a=-0.75)."""
    ax = abs(x)
    if ax <= 1.0:
        return (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
    if ax < 2.0:
        return a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
    return 0.0


def _cubic_resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """Dense (n_out, n_in) interpolation matrix reproducing cv2.INTER_CUBIC
    sampling (no anti-aliasing, border replicate). Resize then becomes two
    matmuls — exact parity with cv2 and MXU-friendly on TPU."""
    import numpy as np

    W = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        # cv2 quantizes interpolation coefficients to fixed point with
        # INTER_RESIZE_COEF_SCALE = 2048 even for float images; reproduce that
        # for bit-parity with the reference's cv2.resize calls.
        ws = [_cv2_cubic_weight(k - frac) for k in range(-1, 3)]
        ws = [round(w * 2048.0) / 2048.0 for w in ws]
        for k, w in zip(range(-1, 3), ws):
            idx = min(max(i0 + k, 0), n_in - 1)
            W[i, idx] += w
    return jnp.asarray(W)


def resize_image(img: jnp.ndarray, out_hw: tuple[int, int], method: str = "cubic") -> jnp.ndarray:
    """Resize leading two spatial dims.

    method="cubic" reproduces cv2.INTER_CUBIC exactly (used by the depth/mask
    rectification path, combined_rendering.py:184, 207): no anti-aliasing,
    a=-0.75 kernel, replicated borders. Implemented as two dense matmuls so it
    runs on the MXU. Other methods fall through to jax.image.resize.
    """
    img = img.astype(jnp.float32)
    if method != "cubic":
        out_shape = (out_hw[0], out_hw[1]) + img.shape[2:]
        return jax.image.resize(img, out_shape, method=method)
    h_in, w_in = img.shape[0], img.shape[1]
    Wr = _cubic_resize_matrix(h_in, out_hw[0])  # (h_out, h_in)
    Wc = _cubic_resize_matrix(w_in, out_hw[1])  # (w_out, w_in)
    # f32 precision required for cv2 parity (TPU matmul defaults to bf16).
    hi = jax.lax.Precision.HIGHEST
    out = jnp.tensordot(Wr, img, axes=(1, 0), precision=hi)  # (h_out, w_in, ...)
    out = jnp.moveaxis(jnp.tensordot(Wc, out, axes=(1, 1), precision=hi), 0, 1)
    return out


def rectify_depth(depth: jnp.ndarray, resolution: int = 336) -> jnp.ndarray:
    """GT depth (H, W) -> CLIP-view depth (res, res), center-cropped + cubic.

    Parity: combined_rendering.py:166-187 (we return (res, res), the reference
    repeats to (res, res, 4) only to match NGP's RGBA render buffer layout).
    """
    sq = center_crop_square(depth)
    return resize_image(sq, (resolution, resolution), method="cubic")


def rectify_mask(mask: jnp.ndarray, resolution: int = 336) -> jnp.ndarray:
    """GT mask (H, W) -> CLIP-view mask (res, res).

    Parity: combined_rendering.py:189-209 (uint8 + INTER_CUBIC in the
    reference; we resize as float and the caller compares against 0).
    """
    sq = center_crop_square(mask.astype(jnp.float32))
    out = resize_image(sq, (resolution, resolution), method="cubic")
    return out


def gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    """torchvision's gaussian kernel: normalized exp(-x^2 / (2 sigma^2))."""
    half = (kernel_size - 1) * 0.5
    x = jnp.linspace(-half, half, kernel_size)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def gaussian_blur(img: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur over the last two axes, reflect-free (zero-pad
    is NOT used: torchvision pads by reflection, but the smoothing call-site
    pads explicitly first — see geometry_utils.py:261 — so we use 'SAME' with
    edge replication disabled and rely on the caller's padding).

    img: (..., H, W).
    """
    k = gaussian_kernel1d(kernel_size, sigma).astype(img.dtype)
    pad = kernel_size // 2

    def conv_last(x, kern):
        # x: (..., N). Convolve along last axis with reflect padding to match
        # torchvision.gaussian_blur's internal reflect pad.
        xp = jnp.concatenate(
            [x[..., 1 : pad + 1][..., ::-1], x, x[..., -pad - 1 : -1][..., ::-1]],
            axis=-1,
        )
        windows = jnp.stack(
            [xp[..., i : i + x.shape[-1]] for i in range(kernel_size)], axis=-1
        )
        return windows @ kern

    out = conv_last(img, k)
    out = jnp.swapaxes(conv_last(jnp.swapaxes(out, -1, -2), k), -1, -2)
    return out


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB transfer (instant-ngp common.py semantics,
    used at combined_rendering.py:150).

    Differentiation-safe: the power branch's input is clamped away from 0
    before jnp.power, else d/dx x^(1/2.4) -> inf at 0 and the where() grad
    turns it into NaN (this is trained through in the NGP loss).
    """
    x = jnp.clip(x, 0.0, 1.0)
    lo = x <= 0.0031308
    x_safe = jnp.where(lo, 0.0031308, x)
    return jnp.where(lo, 12.92 * x, 1.055 * jnp.power(x_safe, 1.0 / 2.4) - 0.055)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))
