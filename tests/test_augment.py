"""Device-side augmentation vs PIL/torchvision-semantics oracles."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from basd_tpu.data import augment as A

RNG = np.random.default_rng(5)


def _img(h=32, w=32):
    return RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _pil(arr):
    return Image.fromarray(arr)


# --------------------------------------------------------- photometric ops


def test_posterize_matches_pil():
    img = _img()
    for bits in (2, 4, 7, 8):
        ours = np.asarray(A._posterize(jnp.asarray(img, jnp.float32), bits))
        ref = np.asarray(ImageOps.posterize(_pil(img), bits))
        np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_solarize_matches_pil():
    img = _img()
    for thr in (0, 64, 128, 255):
        ours = np.asarray(A._solarize(jnp.asarray(img, jnp.float32), float(thr)))
        ref = np.asarray(ImageOps.solarize(_pil(img), thr))
        np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_autocontrast_matches_pil():
    img = _img()
    # compress the range so autocontrast actually stretches
    img = (img // 2 + 60).astype(np.uint8)
    ours = np.asarray(A._autocontrast(jnp.asarray(img, jnp.float32), 0.0))
    ref = np.asarray(ImageOps.autocontrast(_pil(img)))
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_equalize_matches_pil():
    img = _img(24, 24)
    ours = np.asarray(A._equalize(jnp.asarray(img, jnp.float32), 0.0))
    ref = np.asarray(ImageOps.equalize(_pil(img)))
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_brightness_matches_pil():
    img = _img()
    for f in (0.2, 0.9, 1.5):
        ours = np.asarray(A._brightness(jnp.asarray(img, jnp.float32), f))
        ref = np.asarray(ImageEnhance.Brightness(_pil(img)).enhance(f))
        assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_color_matches_pil():
    img = _img()
    for f in (0.3, 1.7):
        ours = np.asarray(A._color(jnp.asarray(img, jnp.float32), f))
        ref = np.asarray(ImageEnhance.Color(_pil(img)).enhance(f))
        assert np.abs(ours - ref.astype(np.float32)).max() <= 2.0


def test_contrast_matches_pil():
    img = _img()
    for f in (0.3, 1.7):
        ours = np.asarray(A._contrast(jnp.asarray(img, jnp.float32), f))
        ref = np.asarray(ImageEnhance.Contrast(_pil(img)).enhance(f))
        assert np.abs(ours - ref.astype(np.float32)).max() <= 2.0


def test_sharpness_matches_pil():
    img = _img()
    for f in (0.2, 2.0):
        ours = np.asarray(A._sharpness(jnp.asarray(img, jnp.float32), f))
        ref = np.asarray(ImageEnhance.Sharpness(_pil(img)).enhance(f))
        assert np.abs(ours - ref.astype(np.float32)).max() <= 2.0


# ---------------------------------------------------------- geometric ops


def test_rotate_90_matches_rot90():
    img = _img(16, 16).astype(np.float32)
    ours = np.asarray(A._rotate(jnp.asarray(img), 90.0))
    ref = np.rot90(img, 1, axes=(0, 1))
    np.testing.assert_array_equal(ours, ref)


def test_translate_shifts_pixels():
    img = _img(16, 16).astype(np.float32)
    ours = np.asarray(A._translate_x(jnp.asarray(img), 5.0))
    # shift right by 5, zero-fill on the left
    np.testing.assert_array_equal(ours[:, 5:], img[:, :-5])
    np.testing.assert_array_equal(ours[:, :5], 0.0)
    ours_y = np.asarray(A._translate_y(jnp.asarray(img), -3.0))
    np.testing.assert_array_equal(ours_y[:-3], img[3:])


def test_shear_preserves_center_row():
    img = _img(17, 17).astype(np.float32)
    ours = np.asarray(A._shear_x(jnp.asarray(img), 0.5))
    # the center row is on the shear axis and should be unchanged
    np.testing.assert_array_equal(ours[8], img[8])


def test_trivial_augment_deterministic_per_key():
    img = jnp.asarray(_img(16, 16), jnp.float32)
    a = np.asarray(A.trivial_augment_wide(jax.random.PRNGKey(0), img))
    b = np.asarray(A.trivial_augment_wide(jax.random.PRNGKey(0), img))
    np.testing.assert_array_equal(a, b)
    vals = set()
    for s in range(12):
        out = np.asarray(A.trivial_augment_wide(jax.random.PRNGKey(s), img))
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 255
        vals.add(float(out.sum()))
    assert len(vals) > 3  # different ops fired across seeds


# ------------------------------------------------------------------- RRC


def test_random_resized_crop_shape_and_range():
    img = jnp.asarray(_img(40, 40), jnp.float32)
    out = A.random_resized_crop(jax.random.PRNGKey(0), img, 32)
    assert out.shape == (32, 32, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 256.0
    outs = [
        float(A.random_resized_crop(jax.random.PRNGKey(s), img, 32).sum())
        for s in range(8)
    ]
    assert len(set(outs)) > 4  # boxes vary


def test_rrc_folded_flip_matches_materialized_flip_downscale():
    # 250 -> 64: with scale=(0.08, 1.0) every crop from a 250px canvas is
    # a DOWNSCALE (cw >= sqrt(0.08)*250 = 70 > 64), where antialiasing
    # matters. jax.image's kernel_scale = max(1/scale, 1) silently dropped
    # the antialias for the folded (negative-scale) flip; the |scale| fix
    # makes fold == flip-after-resample bitwise (ADVICE r2, high).
    img = jnp.asarray(RNG.integers(0, 256, (250, 250, 3)), jnp.float32)
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        unflipped = np.asarray(A.random_resized_crop(key, img, 64, flip=jnp.asarray(False)))
        folded = np.asarray(A.random_resized_crop(key, img, 64, flip=jnp.asarray(True)))
        # ~1e-5 relative roundoff from the translation arithmetic; the
        # pre-fix antialias bug was 0.13 RELATIVE (tens absolute on the
        # 0..255 scale), so atol=0.01 cleanly separates the two.
        np.testing.assert_allclose(folded, unflipped[:, ::-1], rtol=0, atol=1e-2)


def test_rrc_matches_jax_image_scale_and_translate():
    # the explicit weight-matrix resample must reproduce
    # jax.image.scale_and_translate for positive scales (the torchvision
    # antialias parity path).
    img = jnp.asarray(RNG.integers(0, 256, (100, 90, 3)), jnp.float32)
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        top, left, ch, cw = A._rrc_params(key, 100, 90)
        sy, sx = 48 / ch, 48 / cw
        ref = jax.image.scale_and_translate(
            img, (48, 48, 3), (0, 1),
            jnp.stack([jnp.float32(sy), jnp.float32(sx)]),
            jnp.stack([jnp.float32(-top * sy), jnp.float32(-left * sx)]),
            method="linear", antialias=True,
        )
        got = A.random_resized_crop(key, img, 48, flip=jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_rrc_full_scale_is_near_identity():
    img = jnp.asarray(_img(32, 32), jnp.float32)
    # scale=(1,1), ratio=(1,1) forces the full-image crop
    top, left, ch, cw = A._rrc_params(
        jax.random.PRNGKey(0), 32, 32, scale=(1.0, 1.0), ratio=(1.0, 1.0)
    )
    assert (float(top), float(left), float(ch), float(cw)) == (0.0, 0.0, 32.0, 32.0)


# ------------------------------------------------------------ mix + views


def test_mixup_cutmix_targets_consistent():
    imgs = jnp.asarray(RNG.standard_normal((8, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(RNG.integers(0, 10, 8))
    onehot = np.eye(10, dtype=np.float32)[np.asarray(labels)]
    rolled = np.roll(onehot, 1, axis=0)
    for seed in range(6):
        mixed, targets = A.mixup_cutmix(jax.random.PRNGKey(seed), imgs, labels, 10)
        t = np.asarray(targets)
        np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)
        # targets must be lam * onehot + (1 - lam) * rolled for a single lam
        lam_grid = t[onehot.astype(bool) & ~rolled.astype(bool)]
        if lam_grid.size:
            assert np.allclose(lam_grid, lam_grid.flat[0], atol=1e-5)


def test_make_train_views_shapes_and_clean_parity():
    b, r, s = 4, 40, 32
    u8 = RNG.integers(0, 256, (b, r, r, 3), dtype=np.uint8)
    t_stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    d_stats = ((0.4, 0.4, 0.4), (0.3, 0.3, 0.3))
    clean, aug = A.make_train_views(
        jax.random.PRNGKey(0), jnp.asarray(u8), s, d_stats, t_stats
    )
    assert clean.shape == (b, s, s, 3)
    assert aug.shape == (b, s, s, 3)
    # clean view == center crop + normalize, bit-exact
    off = (r - s) // 2
    ref = (u8[:, off : off + s, off : off + s].astype(np.float32) / 255.0 - 0.5) / 0.25
    np.testing.assert_allclose(np.asarray(clean), ref, rtol=1e-5, atol=1e-5)


def test_make_train_views_bf16_is_exact_cast_of_f32():
    """out_dtype=bfloat16 must be value-identical to computing the f32
    views and casting afterwards — the cast is simply moved inside the
    jit (all augmentation math stays f32)."""
    b, r, s = 4, 40, 32
    u8 = jnp.asarray(RNG.integers(0, 256, (b, r, r, 3), dtype=np.uint8))
    t_stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    d_stats = ((0.4, 0.4, 0.4), (0.3, 0.3, 0.3))
    key = jax.random.PRNGKey(0)
    clean32, aug32 = A.make_train_views(key, u8, s, d_stats, t_stats)
    clean16, aug16 = A.make_train_views(
        key, u8, s, d_stats, t_stats, out_dtype=jnp.bfloat16
    )
    assert clean16.dtype == jnp.bfloat16 and aug16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(clean32.astype(jnp.bfloat16), np.float32),
        np.asarray(clean16, np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(aug32.astype(jnp.bfloat16), np.float32),
        np.asarray(aug16, np.float32),
    )


def test_mixup_blend_bf16_close_to_f32_blend():
    """The in-dtype MixUp blend on bf16 images must agree with the f32
    blend to bf16 rounding, and the soft targets must mix with EXACTLY
    the coefficient applied to the pixels (the bf16-rounded lambda on
    the bf16 path) — images and labels never use different lambdas."""
    imgs32 = jnp.asarray(RNG.standard_normal((8, 16, 16, 3)), jnp.float32)
    imgs16 = imgs32.astype(jnp.bfloat16)
    labels = jnp.asarray(RNG.integers(0, 10, 8))
    onehot = np.eye(10, dtype=np.float32)[np.asarray(labels)]
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        m32, t32 = A.mixup_cutmix(key, imgs32, labels, 10)
        m16, t16 = A.mixup_cutmix(key, imgs16, labels, 10)
        assert m16.dtype == jnp.bfloat16
        a = np.asarray(m32, np.float32)
        bm = np.asarray(m16, np.float32)
        # bf16 has 8 mantissa bits: 2^-8 relative per element, times
        # three roundings — the f32->bf16 input quantization of BOTH
        # blend operands plus the multiply and add (the quantization
        # errors of images and rolled_img are independent, so the 2x
        # "two roundings" bound was marginally exceedable on unlucky
        # draws: observed 1.04 * 2^-7 at seed-order dependence)
        assert np.max(np.abs(a - bm)) <= 3 * 2 ** -8 * max(np.abs(a).max(), 1.0)
        # targets follow the pixel lambda: identical on the cutmix
        # branch, <= 1 bf16 ulp apart on the mixup branch
        np.testing.assert_allclose(
            np.asarray(t32), np.asarray(t16), rtol=2 ** -8, atol=2 ** -9
        )
        # white-box branch replication: on the mixup branch, the bf16
        # pixel blend and the targets must both use the SAME rounded lam
        k_choice, k_lam, _ = jax.random.split(key, 3)
        if bool(jax.random.bernoulli(k_choice, 0.5)):
            lam16 = jax.random.beta(k_lam, 1.0, 1.0).astype(jnp.bfloat16)
            ref16 = lam16 * imgs16 + (1.0 - lam16) * jnp.roll(imgs16, 1, 0)
            np.testing.assert_array_equal(
                np.asarray(m16, np.float32), np.asarray(ref16, np.float32)
            )
            lam_f = float(jnp.asarray(lam16, jnp.float32))
            ref_t = lam_f * onehot + (1.0 - lam_f) * np.roll(onehot, 1, 0)
            np.testing.assert_array_equal(np.asarray(t16), ref_t)


def test_make_eval_view():
    u8 = RNG.integers(0, 256, (2, 40, 40, 3), dtype=np.uint8)
    out = A.make_eval_view(jnp.asarray(u8), 32, ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    assert out.shape == (2, 32, 32, 3)
    assert float(out.max()) <= 1.0


def test_batched_taw_matches_per_image_semantics():
    """The batched TAW path must produce each op's exact output; compare
    every op branch against the per-image implementation by forcing the
    op/magnitude draws."""
    import jax

    from basd_tpu.data.augment import (
        _NUM_OPS,
        _TAW_MAGS,
        _TAW_SIGNED,
        _TAW_FNS,
        trivial_augment_wide_batch,
    )

    b = 28  # 2 draws per op, most ops covered
    imgs = jnp.asarray(
        RNG.integers(0, 256, (b, 24, 24, 3), dtype=np.uint8), jnp.float32
    )
    key = jax.random.PRNGKey(3)
    out_batch = np.asarray(trivial_augment_wide_batch(key, imgs))

    # reproduce the batch's own draws, then apply the per-image fns
    k_op, k_mag, k_sign = jax.random.split(key, 3)
    op = np.asarray(jax.random.randint(k_op, (b,), 0, _NUM_OPS))
    mag_idx = np.asarray(jax.random.randint(k_mag, (b,), 0, _NUM_BINS := 31))
    mag = np.asarray(_TAW_MAGS)[op, mag_idx]
    sign = np.where(
        (np.asarray(_TAW_SIGNED)[op] > 0)
        & np.asarray(jax.random.bernoulli(k_sign, 0.5, (b,))),
        -1.0,
        1.0,
    )
    mag = mag * sign
    for i in range(b):
        ref = np.asarray(
            jnp.round(
                jnp.clip(
                    _TAW_FNS[int(op[i])](jnp.round(imgs[i]), float(mag[i])),
                    0,
                    255,
                )
            )
        )
        np.testing.assert_array_equal(
            out_batch[i], ref, err_msg=f"op={op[i]} mag={mag[i]}"
        )


def test_stratified_taw_per_image_semantics():
    """Each stratified-TAW output must exactly equal the assigned op
    applied at the drawn magnitude (the draws are returned for test)."""
    from basd_tpu.data.augment import (
        _TAW_FNS,
        trivial_augment_wide_stratified,
    )

    b = 30
    imgs = jnp.asarray(
        RNG.integers(0, 256, (b, 20, 20, 3), dtype=np.uint8), jnp.float32
    )
    out, ops, mags = trivial_augment_wide_stratified(
        jax.random.PRNGKey(9), imgs, return_draws=True
    )
    out = np.asarray(out)
    ops = np.asarray(ops)
    mags = np.asarray(mags)
    assert sorted(np.bincount(ops, minlength=14).tolist())[-1] <= 4  # stratified
    for i in range(b):
        ref = np.asarray(
            jnp.round(
                jnp.clip(
                    _TAW_FNS[int(ops[i])](jnp.round(imgs[i]), float(mags[i])),
                    0,
                    255,
                )
            )
        )
        if int(ops[i]) == 5:
            # rotation uses the 3-shear fast path: <=1px deviation from the
            # exact inverse map; require most pixels to agree exactly
            frac_eq = (out[i] == ref).mean()
            assert frac_eq > 0.5, f"rotate mismatch frac_eq={frac_eq}"
        else:
            np.testing.assert_array_equal(
                out[i], ref, err_msg=f"i={i} op={ops[i]} mag={mags[i]}"
            )


def test_stratified_taw_marginal_uniformity():
    """Across keys, each image position receives every op with roughly
    uniform frequency (the permutation guarantees the marginal)."""
    from basd_tpu.data.augment import trivial_augment_wide_stratified

    imgs = jnp.asarray(RNG.integers(0, 256, (14, 8, 8, 3)), jnp.float32)
    counts = np.zeros((14, 14), np.int64)
    for s in range(60):
        _, ops, _ = trivial_augment_wide_stratified(
            jax.random.PRNGKey(s), imgs, return_draws=True
        )
        ops = np.asarray(ops)
        for i in range(14):
            counts[i, ops[i]] += 1
    # each image saw at least 2 distinct ops and no op dominates
    assert (counts.max(axis=1) < 30).all()
    assert ((counts > 0).sum(axis=1) >= 5).all()


def test_three_pass_rotation_on_smooth_image():
    """3-shear rotation must closely match the exact inverse map on a
    smooth image (<=1px shifts => tiny value differences)."""
    from basd_tpu.data.augment import _geom_three_pass, _rotate

    h = w = 33
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy * 3, xx * 3, (yy + xx) * 1.5], -1)
    for deg in (17.0, -40.0, 95.0, -130.0):
        fast = np.asarray(
            _geom_three_pass(
                jnp.asarray(img)[None],
                jnp.asarray([5]),
                jnp.asarray([deg], jnp.float32),
            )
        )[0]
        exact = np.asarray(_rotate(jnp.asarray(img), deg))
        interior = (exact > 0) & (fast > 0)
        diff = np.abs(fast - exact)[interior]
        assert np.median(diff) <= 6.0, (deg, np.median(diff))


def test_shift_passes_exact_for_shear_translate():
    from basd_tpu.data.augment import (
        _geom_three_pass,
        _shear_x,
        _shear_y,
        _translate_x,
        _translate_y,
    )

    img = jnp.asarray(RNG.integers(0, 256, (24, 24, 3)), jnp.float32)
    cases = [(1, 0.7, _shear_x), (2, -0.5, _shear_y),
             (3, 7.0, _translate_x), (4, -5.0, _translate_y)]
    for op, mag, fn in cases:
        fast = np.asarray(
            _geom_three_pass(
                img[None], jnp.asarray([op]), jnp.asarray([mag], jnp.float32)
            )
        )[0]
        exact = np.asarray(fn(img, mag))
        np.testing.assert_array_equal(fast, exact, err_msg=f"op={op}")
