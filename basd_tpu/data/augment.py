"""Device-side image augmentation (jit-compiled, runs inside the train
step).

The reference builds its views on the host with torchvision v2
(reference: ``src/data/datasets.py:137-156``):

- augmented view: RandomResizedCrop -> RandomHorizontalFlip ->
  TrivialAugmentWide -> normalize(dataset stats);
- clean view: Resize(round(S/crop_ratio)) -> CenterCrop(S) ->
  normalize(teacher stats);
- MixUp/CutMix (RandomChoice, alpha=1.0) on the augmented view only
  (reference: ``src/training/trainer.py:89-92,138``).

TPU-first: the host ships ONE (B, R, R, 3) uint8 canvas per batch
(R = round(S / crop_ratio), aspect-resized + center-cropped); both views,
all 14 TrivialAugmentWide ops, and MixUp/CutMix are computed on device in
the jitted step. This halves H2D bytes vs the reference's two f32 views
and moves augmentation off the host CPU entirely.

Faithfulness notes: op semantics mirror torchvision (PIL) — NEAREST
resampling with zero fill for geometric TAW ops, exact Enhance blends,
integer histogram equalize; RandomResizedCrop boxes are sampled on the
R x R canvas rather than the original-resolution image (a documented
distributional deviation for aspect ratios != 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# TrivialAugmentWide magnitude space (torchvision v2, num_bins=31)
_NUM_BINS = 31
_NUM_OPS = 14


def _taw_magnitudes():
    import numpy as np

    bins = np.arange(_NUM_BINS, dtype=np.float32)
    lin = lambda hi: np.linspace(0.0, hi, _NUM_BINS, dtype=np.float32)
    mags = np.zeros((_NUM_OPS, _NUM_BINS), np.float32)
    signed = np.zeros((_NUM_OPS,), np.float32)
    # 0 Identity
    # 1 ShearX, 2 ShearY (factor 0..0.99, signed)
    mags[1] = lin(0.99); signed[1] = 1
    mags[2] = lin(0.99); signed[2] = 1
    # 3 TranslateX, 4 TranslateY (0..32 px, signed)
    mags[3] = lin(32.0); signed[3] = 1
    mags[4] = lin(32.0); signed[4] = 1
    # 5 Rotate (0..135 deg, signed)
    mags[5] = lin(135.0); signed[5] = 1
    # 6 Brightness, 7 Color, 8 Contrast, 9 Sharpness (0..0.99, signed)
    for i in (6, 7, 8, 9):
        mags[i] = lin(0.99); signed[i] = 1
    # 10 Posterize: 8 - round(bin / ((nb-1)/6)) -> 8..2 bits
    mags[10] = 8.0 - np.round(bins / ((_NUM_BINS - 1) / 6.0))
    # 11 Solarize: 255..0
    mags[11] = np.linspace(255.0, 0.0, _NUM_BINS, dtype=np.float32)
    # 12 AutoContrast, 13 Equalize: no magnitude
    return jnp.asarray(mags), jnp.asarray(signed)


_TAW_MAGS, _TAW_SIGNED = _taw_magnitudes()


# -- geometric ops ---------------------------------------------------------


def _affine_nearest(img: jnp.ndarray, mat: jnp.ndarray, offset: jnp.ndarray):
    """Inverse-map an (H, W, C) image: src = mat @ dst + offset, nearest
    sampling, zero fill (torchvision tensor-mode defaults for TAW)."""
    h, w = img.shape[0], img.shape[1]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = mat[0, 0] * xx + mat[0, 1] * yy + offset[0]
    sy = mat[1, 0] * xx + mat[1, 1] * yy + offset[1]
    ix = jnp.round(sx).astype(jnp.int32)
    iy = jnp.round(sy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    out = img[iyc, ixc]
    return jnp.where(valid[..., None], out, 0.0)


def _centered_affine(img, a, b, c, d, tx, ty):
    """src = A @ (dst - center - t) + center with A = [[a,b],[c,d]]."""
    h, w = img.shape[0], img.shape[1]
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    mat = jnp.asarray([[a, b], [c, d]], jnp.float32)
    offset = jnp.asarray(
        [
            cx - (a * (cx + tx) + b * (cy + ty)),
            cy - (c * (cx + tx) + d * (cy + ty)),
        ],
        jnp.float32,
    )
    return _affine_nearest(img, mat, offset)


def _shear_x(img, m):
    return _centered_affine(img, 1.0, -m, 0.0, 1.0, 0.0, 0.0)


def _shear_y(img, m):
    return _centered_affine(img, 1.0, 0.0, -m, 1.0, 0.0, 0.0)


def _translate_x(img, px):
    return _centered_affine(img, 1.0, 0.0, 0.0, 1.0, px, 0.0)


def _translate_y(img, px):
    return _centered_affine(img, 1.0, 0.0, 0.0, 1.0, 0.0, px)


def _rotate(img, deg):
    rad = deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # torchvision/PIL rotate: positive angle is visually counter-clockwise
    # (y-down pixel coords), so the inverse map applies the visually-CW
    # rotation [[cos, -sin], [sin, cos]].
    return _centered_affine(img, cos, -sin, sin, cos, 0.0, 0.0)


# -- photometric ops (PIL semantics, on float images in [0, 255]) ----------


def _gray(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _blend(a, b, f):
    """PIL Image.blend-style: a + f * (b - a), clipped."""
    return jnp.clip(a + f * (b - a), 0.0, 255.0)


def _brightness(img, f):
    return jnp.clip(img * f, 0.0, 255.0)


def _color(img, f):
    g = _gray(img)[..., None]
    return _blend(jnp.broadcast_to(g, img.shape), img, f)


def _contrast(img, f):
    # torchvision: mean over the rounded grayscale image
    mean = jnp.mean(jnp.round(_gray(img)))
    return _blend(jnp.full_like(img, mean), img, f)


def _sharpness(img, f):
    # PIL SMOOTH kernel, borders passed through unchanged
    kernel = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32
    ) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.broadcast_to(kernel, (img.shape[-1], 1, 3, 3)),
        (1, 1),
        "SAME",
        feature_group_count=img.shape[-1],
    )[0].transpose(1, 2, 0)
    blurred = jnp.clip(jnp.round(blurred), 0.0, 255.0)
    h, w = img.shape[0], img.shape[1]
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
    blurred = jnp.where(border[..., None], img, blurred)
    return _blend(blurred, img, f)


def _posterize(img, bits):
    shift = (8.0 - bits).astype(jnp.int32) if hasattr(bits, "astype") else int(8 - bits)
    q = img.astype(jnp.int32)
    mask = jnp.left_shift(jnp.right_shift(q, shift), shift)
    return mask.astype(jnp.float32)


def _solarize(img, threshold):
    return jnp.where(img >= threshold, 255.0 - img, img)


def _autocontrast(img, _):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = jnp.clip((img - lo) * scale, 0.0, 255.0)
    return jnp.where(hi > lo, out, img)


def _equalize_channel(chan):
    """torchvision _scale_channel semantics on a uint8-valued channel."""
    ichan = chan.astype(jnp.int32).reshape(-1)
    hist = jnp.zeros((256,), jnp.int32).at[ichan].add(1)
    # step = (pixel count minus the last nonzero bin's count) // 255
    nonzero = hist > 0
    idx = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0).squeeze(-1)
    last_nz = jnp.max(jnp.where(nonzero, idx, -1))
    step = (jnp.sum(hist) - hist[last_nz]) // 255
    cum = jnp.cumsum(hist)
    lut = (cum + step // 2) // jnp.maximum(step, 1)
    lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]]), 0, 255)
    eq = lut[ichan].reshape(chan.shape).astype(jnp.float32)
    return jnp.where(step == 0, chan, eq)


def _equalize(img, _):
    return jnp.stack(
        [_equalize_channel(jnp.round(img[..., c])) for c in range(img.shape[-1])],
        axis=-1,
    )


_TAW_FNS = [
    lambda img, m: img,  # identity
    _shear_x,
    _shear_y,
    _translate_x,
    _translate_y,
    _rotate,
    lambda img, m: _brightness(img, 1.0 + m),
    lambda img, m: _color(img, 1.0 + m),
    lambda img, m: _contrast(img, 1.0 + m),
    lambda img, m: _sharpness(img, 1.0 + m),
    _posterize,
    _solarize,
    _autocontrast,
    _equalize,
]


def trivial_augment_wide(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """One uniformly-chosen op at a uniformly-chosen magnitude, sign
    flipped with p=0.5 (torchvision TrivialAugmentWide). ``img`` is
    (H, W, C) float32 in [0, 255]; TAW operates on integer-valued pixels,
    so the input is rounded first."""
    k_op, k_mag, k_sign = jax.random.split(key, 3)
    img = jnp.round(jnp.clip(img, 0.0, 255.0))
    op = jax.random.randint(k_op, (), 0, _NUM_OPS)
    mag_idx = jax.random.randint(k_mag, (), 0, _NUM_BINS)
    mag = _TAW_MAGS[op, mag_idx]
    sign = jnp.where(
        (_TAW_SIGNED[op] > 0) & jax.random.bernoulli(k_sign, 0.5), -1.0, 1.0
    )
    mag = mag * sign
    out = jax.lax.switch(op, _TAW_FNS, img, mag)
    return jnp.round(jnp.clip(out, 0.0, 255.0))


# -- shift-based geometric ops (TPU fast path) -----------------------------
#
# The per-pixel inverse-map gather cost ~170 ms/step at B=512/224px
# (traced: one 9.1M-element XLA gather). All five TAW geometric ops are
# instead expressed as per-LINE integer shifts — contiguous row slices,
# not scalar gathers:
#   shear_x / translate_x: one row-shift pass (EXACT vs the per-pixel
#     map: round(x + c) == x + round(c) for integer x);
#   shear_y / translate_y: one column-shift pass (transpose + row pass);
#   rotate(theta): the classic 3-shear decomposition
#     R(-t) = Sx(-tan(t/2)) Sy(sin t) Sx(-tan(t/2)), with a 180-degree
#     pre-flip for |theta| > 90 so shear factors stay <= 1. Each pass
#     rounds independently (<= 1px deviation from the exact map).


def _barrel_shift(x: jnp.ndarray, s: jnp.ndarray, axis: int) -> jnp.ndarray:
    """out[..., j, ...] = x[..., (j + s) mod size, ...] along ``axis``,
    where ``s`` in [0, size) varies over the OTHER spatial axis.

    Logarithmic barrel shifter: log2 passes of static roll + select —
    full-tensor vector ops (per-pixel gathers measured 170 ms/step and
    per-row dynamic slices ~1 s/step for this workload on v5e; this
    cascade is bandwidth-bound at ~log2(size) passes over the tensor).
    """
    size = x.shape[axis]
    bits = max(1, int(size - 1).bit_length())
    sel_shape = list(x.shape)
    sel_shape[axis] = 1
    cur = x
    for k in range(bits):
        step = 1 << k
        rolled = jnp.roll(cur, -step, axis=axis)
        take = ((s >> k) & 1).astype(bool)
        take = take.reshape(sel_shape)
        cur = jnp.where(take, rolled, cur)
    return cur


def _shift_rows(x: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """out[g, y, x] = x_in[g, y, x - r[g, y]] with zero fill.

    x: (G, H, W, C); r: (G, H) int32. Channels fold into batch so the
    shifted axis is minor (a trailing C=3 axis would be tile-padded to
    128 lanes — 42x memory blowup, observed as an OOM).

    The shift runs with WRAPAROUND on the unpadded width (8 roll+select
    passes on W=224) and the wrapped-in pixels are zeroed by one iota
    mask afterwards — 2.1x less traffic than the earlier zero-padded
    cascade (9 passes on W + 2*128)."""
    g, h, w, c = x.shape
    # bf16 cascade: pixel values are integers in [0, 255], exactly
    # representable in bf16 — halves the bandwidth of the roll+select
    # passes.
    xc = jnp.moveaxis(x, -1, 1).reshape(g * c, h, w).astype(jnp.bfloat16)
    s = jnp.mod(-r, w)  # (G, H)
    sb = jnp.broadcast_to(s[:, None, :], (g, c, h)).reshape(g * c, h)
    out = _barrel_shift(xc, sb, axis=-1)
    jj = jnp.arange(w, dtype=jnp.int32)
    valid = (jj >= r[:, :, None]) & (jj < w + r[:, :, None])  # (G, H, W)
    validc = jnp.broadcast_to(valid[:, None], (g, c, h, w)).reshape(g * c, h, w)
    out = jnp.where(validc, out, jnp.bfloat16(0))
    return jnp.moveaxis(out.reshape(g, c, h, w), 1, -1).astype(x.dtype)


def _shift_cols(x: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """out[g, y, x] = x_in[g, y - r[g, x], x] with zero fill."""
    g, h, w, c = x.shape
    xc = jnp.moveaxis(x, -1, 1).reshape(g * c, h, w).astype(jnp.bfloat16)
    s = jnp.mod(-r, h)  # (G, W)
    sb = jnp.broadcast_to(s[:, None, :], (g, c, w)).reshape(g * c, w)
    out = _barrel_shift(xc, sb, axis=-2)
    yy = jnp.arange(h, dtype=jnp.int32)
    valid = (yy[:, None] >= r[:, None, :]) & (
        yy[:, None] < h + r[:, None, :]
    )  # (G, H, W)
    validc = jnp.broadcast_to(valid[:, None], (g, c, h, w)).reshape(g * c, h, w)
    out = jnp.where(validc, out, jnp.bfloat16(0))
    return jnp.moveaxis(out.reshape(g, c, h, w), 1, -1).astype(x.dtype)


def _geom_three_pass(x: jnp.ndarray, op: jnp.ndarray, mag: jnp.ndarray):
    """Apply the geometric TAW op per image via shift passes.

    x: (G, H, W, C); op: (G,) in {1..5}; mag: (G,) signed magnitude.
    """
    g, h, w, c = x.shape
    cy = (h - 1) * 0.5
    cx = (w - 1) * 0.5
    ys = jnp.arange(h, dtype=jnp.float32) - cy  # (H,)
    xs = jnp.arange(w, dtype=jnp.float32) - cx  # (W,)

    rad = mag * (jnp.pi / 180.0)
    # 180-degree pre-flip for large rotations keeps |shear| <= 1
    big = (op == 5) & (jnp.abs(mag) > 90.0)
    rad_eff = jnp.where(big, rad - jnp.sign(mag) * jnp.pi, rad)
    flipped = jnp.where(
        big[:, None, None, None], x[:, ::-1, ::-1, :], x
    )

    a_rot = -jnp.tan(rad_eff / 2.0)
    b_rot = jnp.sin(rad_eff)

    is_sx = op == 1
    is_sy = op == 2
    is_tx = op == 3
    is_ty = op == 4
    is_rot = op == 5

    # pass 1 (rows): shear_x / translate_x / rotate's first x-shear
    # out[y, x] = in[y, x + coef*(y-cy) - t]  =>  r(y) = -round(coef*(y-cy) - t)
    coef1 = jnp.where(is_sx, -mag, jnp.where(is_rot, a_rot, 0.0))
    t1 = jnp.where(is_tx, mag, 0.0)
    r1 = -jnp.round(coef1[:, None] * ys[None, :] - t1[:, None]).astype(jnp.int32)

    # pass 2 (cols): shear_y / translate_y / rotate's y-shear
    coef2 = jnp.where(is_sy, -mag, jnp.where(is_rot, b_rot, 0.0))
    t2 = jnp.where(is_ty, mag, 0.0)
    r2 = -jnp.round(coef2[:, None] * xs[None, :] - t2[:, None]).astype(jnp.int32)

    # pass 3 (rows): rotate's second x-shear
    coef3 = jnp.where(is_rot, a_rot, 0.0)
    r3 = -jnp.round(coef3[:, None] * ys[None, :]).astype(jnp.int32)

    if jax.default_backend() == "tpu":
        # fused kernel: one HBM read + write for all three cascades +
        # masks (the XLA path below is ~24 roll/select slab passes plus 6
        # channel-fold transposes — traced ~6 ms/step at B=512/224px)
        from basd_tpu.ops.pallas.geom_shift import geom_shift3

        return geom_shift3(flipped, r1, r2, r3)

    out = _shift_rows(flipped, r1)
    out = _shift_cols(out, r2)
    out = _shift_rows(out, r3)
    return out


# -- batched TAW (TPU fast path) ------------------------------------------

# op ids: 0 Identity, 1 ShearX, 2 ShearY, 3 TransX, 4 TransY, 5 Rotate,
# 6 Brightness, 7 Color, 8 Contrast, 9 Sharpness, 10 Posterize,
# 11 Solarize, 12 AutoContrast, 13 Equalize


def _batch_affine_params(op, mag, dtype=jnp.float32):
    """Per-image inverse-map affine (a, b, c, d, tx, ty) for the five
    geometric ops; identity for everything else."""
    rad = mag * (jnp.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    one = jnp.ones_like(mag)
    zero = jnp.zeros_like(mag)
    is_sx = op == 1
    is_sy = op == 2
    is_tx = op == 3
    is_ty = op == 4
    is_rot = op == 5
    a = jnp.where(is_rot, cos, one)
    b = jnp.where(is_rot, -sin, jnp.where(is_sx, -mag, zero))
    c = jnp.where(is_rot, sin, jnp.where(is_sy, -mag, zero))
    d = jnp.where(is_rot, cos, one)
    tx = jnp.where(is_tx, mag, zero)
    ty = jnp.where(is_ty, mag, zero)
    return a, b, c, d, tx, ty


def _batch_equalize(imgs: jnp.ndarray) -> jnp.ndarray:
    """Per-image-per-channel histogram equalize for a (B, H, W, C) batch.

    TPU note: both the histogram and the LUT application are expressed as
    compare-and-reduce over the 256 bin values — XLA fuses these into
    scatter-free VPU loops. The scatter-add + table-gather formulation
    cost ~83 ms/step at B=512/224px (traced); this one is ~2 ms.
    """
    b, h, w, c = imgs.shape
    q = jnp.clip(jnp.round(imgs), 0, 255).astype(jnp.int32)
    flat = q.reshape(b, h * w, c)
    # radix-16 factorization: value v = 16*hi + lo, so the 256-way
    # compare-reduce becomes two 16-way one-hots and a (16 x P x 16)
    # contraction on the MXU — hist[b, c, hi, lo] = sum_p E[p,hi] F[p,lo].
    # One-hot entries are 0/1 (exact in bf16); the matmul accumulates in
    # f32, exact for counts < 2^24. 8x fewer VPU compares than the flat
    # 256-bin form (traced: 4.5 ms -> sub-ms at B=512/224px).
    nib = jnp.arange(16, dtype=jnp.int32)
    # f32 carriers: every value (0/1 one-hots, LUT ints <= 255, counts
    # < 2^24) is exact under TPU's default bf16-input/f32-accumulate
    # matmul, and XLA-CPU gets a plain f32 dot (it has no bf16 DotThunk).
    e_hi = ((flat[..., None] >> 4) == nib).astype(jnp.float32)  # (B,P,C,16)
    f_lo = ((flat[..., None] & 15) == nib).astype(jnp.float32)
    hist = jnp.einsum(
        "bpch,bpcl->bchl", e_hi, f_lo,
    ).astype(jnp.int32).reshape(b, c, 256)
    nonzero = hist > 0
    idx = jnp.arange(256)
    last_nz = jnp.max(jnp.where(nonzero, idx, -1), axis=-1)  # (B, C)
    last_count = jnp.take_along_axis(hist, last_nz[..., None], axis=-1)[..., 0]
    step = (jnp.sum(hist, -1) - last_count) // 255  # (B, C)
    cum = jnp.cumsum(hist, axis=-1)
    lut = (cum + (step // 2)[..., None]) // jnp.maximum(step, 1)[..., None]
    lut = jnp.clip(
        jnp.concatenate([jnp.zeros_like(lut[..., :1]), lut[..., :-1]], -1),
        0,
        255,
    ).astype(jnp.float32)
    # LUT application, radix-factored and gather-free:
    # eq[p] = sum_{hi,lo} E[p,hi] lut[hi,lo] F[p,lo]
    #       = sum_lo (E @ lut)[p,lo] * F[p,lo]
    # (E @ lut) is a tiny MXU matmul; the final contraction is 16 madds
    # per pixel instead of 256 selects. Exact: E/F rows are one-hot and
    # lut values 0..255 are integers <= 2^8, exact in bf16/f32.
    m = jnp.einsum("bpch,bchl->bpcl", e_hi, lut.reshape(b, c, 16, 16))
    eq = jnp.sum(m * f_lo, axis=-1).reshape(b, h, w, c)
    no_eq = step == 0  # (B, C)
    return jnp.where(no_eq[:, None, None, :], imgs, eq)


def trivial_augment_wide_stratified(
    key: jax.Array, imgs: jnp.ndarray, return_draws: bool = False
):
    """Stratified batched TrivialAugmentWide — the TPU fast path.

    A uniform random permutation assigns each image to one of 14
    contiguous position blocks, one per op; each image's op is therefore
    still marginally uniform (up to <=1/B rounding from unequal block
    sizes), but every op now runs on a STATIC slice of the batch:

    - the gather-heavy affine warp touches only the 5 geometric blocks
      (~5B/14 images);
    - the scatter-heavy equalize touches only its own block (~B/14) —
      measured 712 ms -> ~50 ms at B=256/224px on v5e;
    - cheap photometric ops run on their slices elementwise.

    Relative to iid per-image op draws this is stratified sampling over
    the batch (negative cross-image correlation, identical marginals) — a
    variance-reduced estimator of the same augmentation distribution.
    Magnitude/sign draws stay iid per image.
    """
    b, h, w, c = imgs.shape
    k_perm, k_mag, k_sign = jax.random.split(key, 3)
    # uint8 boundary: every op consumes/produces integers in [0, 255]
    # (PIL semantics), so the permutation gathers, the part concatenate
    # and the inverse-permutation gather move 4x less HBM than the f32
    # form; each op upcasts only its own batch slice. Output is uint8.
    if imgs.dtype != jnp.uint8:
        imgs = jnp.round(jnp.clip(imgs, 0.0, 255.0)).astype(jnp.uint8)

    perm = jax.random.permutation(k_perm, b)
    inv = jnp.argsort(perm)
    x = imgs[perm]

    bounds = [round(o * b / _NUM_OPS) for o in range(_NUM_OPS + 1)]
    pos_op = np.concatenate(
        [np.full(bounds[o + 1] - bounds[o], o) for o in range(_NUM_OPS)]
    )
    pos_op_j = jnp.asarray(pos_op)

    mag_idx = jax.random.randint(k_mag, (b,), 0, _NUM_BINS)
    mag = _TAW_MAGS[pos_op_j, mag_idx]
    sign = jnp.where(
        (_TAW_SIGNED[pos_op_j] > 0) & jax.random.bernoulli(k_sign, 0.5, (b,)),
        -1.0,
        1.0,
    )
    mag = mag * sign

    parts: list[jnp.ndarray] = []

    def sl(o0, o1):
        return slice(bounds[o0], bounds[o1])

    def q(p):
        # per-part PIL quantization (was one full-batch round at the end)
        return jnp.round(jnp.clip(p, 0.0, 255.0)).astype(jnp.uint8)

    # op 0: identity
    parts.append(x[sl(0, 1)])

    # ops 1-5: shift-pass geometry over the combined geometric slice
    # (pure data movement + zero fill: uint8 in, uint8 out — the shift
    # cascade upcasts to bf16 internally, exact for integers <= 255)
    g = sl(1, 6)
    if bounds[6] > bounds[1]:
        parts.append(_geom_three_pass(x[g], pos_op_j[g], mag[g]))

    f = 1.0 + mag  # enhance factors

    # op 6: brightness
    s = sl(6, 7)
    parts.append(q(x[s].astype(jnp.float32) * f[s, None, None, None]))
    # op 7: color
    s = sl(7, 8)
    xs = x[s].astype(jnp.float32)
    gray = _gray(xs)[..., None]
    parts.append(q(gray + f[s, None, None, None] * (xs - gray)))
    # op 8: contrast
    s = sl(8, 9)
    xs = x[s].astype(jnp.float32)
    mean_gray = jnp.mean(jnp.round(_gray(xs)), axis=(1, 2))[:, None, None, None]
    parts.append(q(mean_gray + f[s, None, None, None] * (xs - mean_gray)))
    # op 9: sharpness
    s = sl(9, 10)
    xs = x[s].astype(jnp.float32)
    kernel = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32
    ) / 13.0
    blurred = jax.lax.conv_general_dilated(
        xs,
        jnp.broadcast_to(kernel[..., None, None], (3, 3, 1, c)),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    blurred = jnp.clip(jnp.round(blurred), 0, 255)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = ((yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1))[None, ..., None]
    blurred = jnp.where(border, xs, blurred)
    parts.append(q(blurred + f[s, None, None, None] * (xs - blurred)))
    # op 10: posterize (bit math in int32 is exact -> direct u8 cast)
    s = sl(10, 11)
    shift = (8.0 - mag[s]).astype(jnp.int32)[:, None, None, None]
    qi = x[s].astype(jnp.int32)
    parts.append(
        jnp.left_shift(jnp.right_shift(qi, shift), shift).astype(jnp.uint8)
    )
    # op 11: solarize (255 - x is exact in uint8; threshold compare in f32)
    s = sl(11, 12)
    xs = x[s]
    parts.append(
        jnp.where(
            xs.astype(jnp.float32) >= mag[s, None, None, None],
            jnp.uint8(255) - xs,
            xs,
        )
    )
    # op 12: autocontrast
    s = sl(12, 13)
    xs = x[s]
    lo = jnp.min(xs, axis=(1, 2), keepdims=True)
    hi = jnp.max(xs, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum((hi - lo).astype(jnp.float32), 1e-5)
    parts.append(
        jnp.where(
            hi > lo,
            q((xs - lo).astype(jnp.float32) * scale),
            xs,
        )
    )
    # op 13: equalize (integer-exact f32 values -> round is a no-op)
    s = sl(13, 14)
    parts.append(q(_batch_equalize(x[s])))

    # every part is already PIL-quantized uint8 (q() per part == the old
    # single full-batch round+clip after the concat, op by op), so the
    # inverse-permutation gather moves uint8 — 4x less HBM than the f32
    # gather + a whole round/clip pass this replaces (traced ~1.7 ms at
    # B=512/224px).
    out = jnp.concatenate(parts, axis=0)[inv]
    if return_draws:
        return out, pos_op_j[inv], mag[inv]
    return out


def trivial_augment_wide_batch(key: jax.Array, imgs: jnp.ndarray) -> jnp.ndarray:
    """Batched TrivialAugmentWide: same per-image semantics as
    ``trivial_augment_wide`` but computed batch-at-once — one affine-warp
    pass covers all geometric ops (per-image matrices), one depthwise conv
    covers sharpness, one scatter covers equalize; the cheap photometric
    ops are elementwise. Avoids vmap-of-switch evaluating 14 branches of
    gather-heavy ops per image."""
    b = imgs.shape[0]
    k_op, k_mag, k_sign = jax.random.split(key, 3)
    imgs = jnp.round(jnp.clip(imgs, 0.0, 255.0))
    op = jax.random.randint(k_op, (b,), 0, _NUM_OPS)
    mag_idx = jax.random.randint(k_mag, (b,), 0, _NUM_BINS)
    mag = _TAW_MAGS[op, mag_idx]
    sign = jnp.where(
        (_TAW_SIGNED[op] > 0) & jax.random.bernoulli(k_sign, 0.5, (b,)),
        -1.0,
        1.0,
    )
    mag = mag * sign

    def sel(cond, val, base):
        return jnp.where(cond[:, None, None, None], val, base)

    # --- geometric: single warp pass -------------------------------------
    affine = _batch_affine_params(op, mag)

    def warp_one(img, a, bb, c, d, tx, ty):
        return _centered_affine(img, a, bb, c, d, tx, ty)

    geom = op <= 5
    any_shape = jax.vmap(warp_one)(imgs, *affine)
    out = sel((op >= 1) & geom, any_shape, imgs)

    # --- photometric ------------------------------------------------------
    f = 1.0 + mag  # enhance factor for ops 6-9
    fb = f[:, None, None, None]
    gray = _gray(imgs)[..., None]  # (B, H, W, 1)

    out = sel(op == 6, jnp.clip(imgs * fb, 0, 255), out)
    color = jnp.clip(gray + fb * (imgs - gray), 0, 255)
    out = sel(op == 7, color, out)
    mean_gray = jnp.mean(jnp.round(gray[..., 0]), axis=(1, 2))[:, None, None, None]
    contrast = jnp.clip(mean_gray + fb * (imgs - mean_gray), 0, 255)
    out = sel(op == 8, contrast, out)

    # sharpness: one depthwise conv over the whole batch
    kernel = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32
    ) / 13.0
    c = imgs.shape[-1]
    blurred = jax.lax.conv_general_dilated(
        imgs,
        jnp.broadcast_to(kernel[..., None, None], (3, 3, 1, c)),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    blurred = jnp.clip(jnp.round(blurred), 0, 255)
    h, w = imgs.shape[1], imgs.shape[2]
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = ((yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1))[None, ..., None]
    blurred = jnp.where(border, imgs, blurred)
    sharp = jnp.clip(blurred + fb * (imgs - blurred), 0, 255)
    out = sel(op == 9, sharp, out)

    # posterize
    shift = (8.0 - mag).astype(jnp.int32)[:, None, None, None]
    qi = imgs.astype(jnp.int32)
    poster = jnp.left_shift(jnp.right_shift(qi, shift), shift).astype(jnp.float32)
    out = sel(op == 10, poster, out)

    # solarize
    solar = jnp.where(imgs >= mag[:, None, None, None], 255.0 - imgs, imgs)
    out = sel(op == 11, solar, out)

    # autocontrast
    lo = jnp.min(imgs, axis=(1, 2), keepdims=True)
    hi = jnp.max(imgs, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    auto = jnp.where(hi > lo, jnp.clip((imgs - lo) * scale, 0, 255), imgs)
    out = sel(op == 12, auto, out)

    # equalize (single scatter pass)
    eq = _batch_equalize(imgs)
    out = sel(op == 13, eq, out)

    return jnp.round(jnp.clip(out, 0.0, 255.0))


# -- RandomResizedCrop -----------------------------------------------------


def _rrc_params(key, h, w, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """torchvision RandomResizedCrop.get_params: 10 attempts then center
    fallback. Returns (top, left, height, width) float32."""
    area = float(h * w)
    keys = jax.random.split(key, 3)
    u_area = jax.random.uniform(keys[0], (10,), minval=scale[0], maxval=scale[1])
    logr = jax.random.uniform(
        keys[1], (10,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    target_area = area * u_area
    aspect = jnp.exp(logr)
    ws = jnp.round(jnp.sqrt(target_area * aspect))
    hs = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (ws > 0) & (ws <= w) & (hs > 0) & (hs <= h)
    first = jnp.argmax(valid)  # first True (0 if none)
    any_valid = jnp.any(valid)
    cw = ws[first]
    ch = hs[first]
    u_ij = jax.random.uniform(keys[2], (2,))
    top = jnp.floor(u_ij[0] * (h - ch + 1.0))
    left = jnp.floor(u_ij[1] * (w - cw + 1.0))

    # fallback: clamp aspect, center
    in_ratio = w / h
    fw = jnp.where(
        in_ratio < ratio[0], float(w),
        jnp.where(in_ratio > ratio[1], jnp.round(h * ratio[1]), float(w)),
    )
    fh = jnp.where(
        in_ratio < ratio[0], jnp.round(w / ratio[0]),
        jnp.where(in_ratio > ratio[1], float(h), float(h)),
    )
    ftop = jnp.round((h - fh) / 2.0)
    fleft = jnp.round((w - fw) / 2.0)

    top = jnp.where(any_valid, top, ftop)
    left = jnp.where(any_valid, left, fleft)
    ch = jnp.where(any_valid, ch, fh)
    cw = jnp.where(any_valid, cw, fw)
    return top, left, ch, cw


def _resample_weight_mat(in_size, out_size, scale, translation):
    """``jax.image``'s compute_weight_mat (triangle kernel, antialias=True)
    with ``kernel_scale = max(1/|scale|, 1)`` instead of ``max(1/scale, 1)``.

    jax's formula yields kernel_scale=1 for any negative scale, silently
    disabling antialiasing for flip-folded DOWNSCALES (upscales are
    unaffected — their kernel_scale is 1 anyway). With the |scale| fix the
    negative-scale weight columns are exactly the mirror of the
    positive-scale ones (sample_f_neg(o) == sample_f_pos(S-1-o)
    analytically), so a folded flip equals flip-after-resample to ~1e-5
    relative (f32 roundoff in the translation arithmetic) for down- AND
    upscales, while staying free (materializing the flip costs ~2.4 ms/step
    of HBM reversal at B=512)."""
    inv_scale = 1.0 / scale
    kernel_scale = jnp.maximum(jnp.abs(inv_scale), 1.0)
    sample_f = (
        (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * inv_scale
        - translation * inv_scale
        - 0.5
    )
    x = (
        jnp.abs(
            sample_f[None, :] - jnp.arange(in_size, dtype=jnp.float32)[:, None]
        )
        / kernel_scale
    )
    weights = jnp.maximum(0.0, 1.0 - x)
    total = jnp.sum(weights, axis=0, keepdims=True)
    weights = jnp.where(
        jnp.abs(total) > 1000.0 * float(np.finfo(np.float32).eps),
        weights / jnp.where(total != 0.0, total, 1.0),
        0.0,
    )
    in_bounds = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return jnp.where(in_bounds[None, :], weights, 0.0)


def random_resized_crop(
    key: jax.Array, img: jnp.ndarray, out_size: int,
    flip: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(H, W, C) float -> (S, S, C); bilinear with antialias (torchvision
    v2 default), as two explicit weight-matrix contractions.

    ``flip`` (scalar bool) folds a horizontal flip into the resample for
    free: output x -> S-1-x is exactly scale_x -> -scale_x with
    translation S + left*scale_x. The weight matrices come from
    ``_resample_weight_mat`` (NOT jax.image.scale_and_translate), whose
    |scale| antialias correction makes the folded flip match
    flip-after-resample (~1e-5 relative) for downscaling crops too."""
    h, w = img.shape[0], img.shape[1]
    top, left, ch, cw = _rrc_params(key, h, w)
    scale_y = out_size / ch
    scale_x = out_size / cw
    tx = -left * scale_x
    if flip is not None:
        sign = jnp.where(flip, -1.0, 1.0)
        tx = jnp.where(flip, out_size + left * scale_x, tx)
    else:
        sign = 1.0
    wy = _resample_weight_mat(h, out_size, scale_y, -top * scale_y)
    wx = _resample_weight_mat(w, out_size, sign * scale_x, tx)
    hi = jax.lax.Precision.HIGHEST  # match scale_and_translate's default
    tmp = jnp.einsum("hs,hwc->swc", wy, img, precision=hi)
    return jnp.einsum("swc,wt->stc", tmp, wx, precision=hi)


def center_crop(img: jnp.ndarray, out_size: int) -> jnp.ndarray:
    h, w = img.shape[-3], img.shape[-2]
    top = (h - out_size) // 2
    left = (w - out_size) // 2
    return img[..., top : top + out_size, left : left + out_size, :]


def normalize(img01: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img01 - mean) / std


# -- MixUp / CutMix --------------------------------------------------------


def mixup_cutmix(
    key: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    alpha: float = 1.0,
    num_shards: int = 1,
):
    """torchvision v2 RandomChoice([MixUp, CutMix]) with alpha=1.0
    (reference: ``src/training/trainer.py:89-92``): one lambda per batch,
    partner = batch rolled by 1; returns (mixed images, soft targets).

    ``num_shards`` > 1 rolls within each data-parallel shard instead of
    across the global batch — exactly the reference's multi-GPU behavior
    (DDP applies MixUp per process) — so no cross-device collective is
    needed inside the augmentation."""
    k_choice, k_lam, k_box = jax.random.split(key, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)

    def shard_roll(x):
        if num_shards <= 1:
            return jnp.roll(x, 1, axis=0)
        b = x.shape[0]
        per = b // num_shards
        grouped = x.reshape((num_shards, per) + x.shape[1:])
        return jnp.roll(grouped, 1, axis=1).reshape(x.shape)

    rolled_img = shard_roll(images)
    rolled_lab = shard_roll(onehot)

    h, w = images.shape[1], images.shape[2]

    use_mixup = jax.random.bernoulli(k_choice, 0.5)

    # Branchless blend: both branches are affine mixes of (images,
    # rolled), so one fused pass replaces the lax.cond — the cond's
    # branch-result copies cost ~2.8 ms/step at bench shapes (traced),
    # the merged blend one 2-read/1-write pass (~0.5 ms). Values are
    # bit-identical to the branches: CutMix coefficients are exact 0/1
    # (multiply by 1.0 / add 0.0 is exact), and the MixUp pair keeps the
    # reference two-term formula. Blending in the image dtype (bf16 on
    # the TPU fast path) halves the HBM traffic; the rounded lam_i IS
    # the effective pixel coefficient, so the target mix uses it too —
    # images and labels mix with the SAME lambda (reference
    # trainer.py:138 semantics), within 1 bf16 ulp of the f32 beta draw.
    lam_i = lam.astype(images.dtype)

    r_y = jax.random.randint(k_box, (), 0, h)
    r_x = jax.random.randint(jax.random.fold_in(k_box, 1), (), 0, w)
    r_h = jnp.sqrt(1.0 - lam) * h
    r_w = jnp.sqrt(1.0 - lam) * w
    y1 = jnp.clip(r_y - r_h / 2, 0, h).astype(jnp.int32)
    y2 = jnp.clip(r_y + r_h / 2, 0, h).astype(jnp.int32)
    x1 = jnp.clip(r_x - r_w / 2, 0, w).astype(jnp.int32)
    x2 = jnp.clip(r_x + r_w / 2, 0, w).astype(jnp.int32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2))[None, :, :, None]
    box_f = box.astype(images.dtype)
    lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)

    c_base = jnp.where(use_mixup, lam_i, 1.0 - box_f)
    c_roll = jnp.where(use_mixup, 1.0 - lam_i, box_f)
    mixed = c_base * images + c_roll * rolled_img
    lam_eff = jnp.where(use_mixup, lam_i.astype(lam.dtype), lam_adj)
    targets = lam_eff * onehot + (1.0 - lam_eff) * rolled_lab
    return mixed, targets


# -- batch pipelines -------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("out_size", "train_stats", "teacher_stats", "out_dtype"),
)
def make_train_views(
    key: jax.Array,
    images_u8: jnp.ndarray,
    out_size: int,
    train_stats: tuple,
    teacher_stats: tuple,
    out_dtype=jnp.float32,
):
    """uint8 (B, R, R, 3) canvas -> (clean, augmented) views.

    clean: center crop S + teacher-stats normalize (reference clean_tf);
    augmented: RRC + hflip + TAW + dataset-stats normalize (reference
    aug_tf). MixUp/CutMix is applied separately by the trainer so train
    accuracy can use unmixed targets (reference ``trainer.py:163``).

    ``out_dtype``: all augmentation math runs in f32 regardless; this
    only casts the final normalized views. The bf16 trainer passes
    bf16 — the models cast their input anyway, and emitting bf16 here
    saves two full (B, S, S, 3) f32 HBM slabs plus half the MixUp blend
    traffic per step (values are identical to casting after normalize:
    it IS the cast after normalize, moved inside the jit).
    """
    b = images_u8.shape[0]

    # slice the uint8 canvas first, upcast only the crop — a global f32
    # canvas materialization costs a (B, R, R, 3) f32 slab (~400 MB at
    # B=512/R=256) that nothing needs whole
    clean = center_crop(images_u8, out_size).astype(jnp.float32) / 255.0
    t_mean, t_std = teacher_stats
    clean = normalize(clean, t_mean, t_std).astype(out_dtype)

    keys = jax.random.split(key, (b, 2))

    def one(img, ks):
        flip = jax.random.bernoulli(ks[1], 0.5)
        return random_resized_crop(
            ks[0], img.astype(jnp.float32), out_size, flip=flip
        )

    cropped = jax.vmap(one)(images_u8, keys)
    augd = trivial_augment_wide_stratified(jax.random.fold_in(key, 7), cropped)
    d_mean, d_std = train_stats
    augd = normalize(augd.astype(jnp.float32) / 255.0, d_mean, d_std).astype(
        out_dtype
    )
    return clean, augd


@partial(jax.jit, static_argnames=("out_size", "stats"))
def make_eval_view(images_u8: jnp.ndarray, out_size: int, stats: tuple):
    x = center_crop(images_u8, out_size).astype(jnp.float32) / 255.0
    mean, std = stats
    return normalize(x, mean, std)
