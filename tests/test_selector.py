"""End-to-end parity: Grassmannian selector + combined BASD loss vs a
reference-faithful torch oracle.

The oracle follows the reference control flow (per-layer Python loops,
dynamic top-k slicing, FULL attention-map mixing); the JAX build uses
batched masked decompositions and reduced importance mixing. Matching
values here validates both the masking equivalence and the
linear-reduction/mixing commutation.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from basd_tpu.losses import (
    BASDLossConfig,
    basd_loss,
    extraction_layers,
    select_and_mix,
)
from basd_tpu.losses.selector import SelectorConfig
from basd_tpu.ops.procrustes import reduce_attention_importance

from .oracles import procrustes_oracle, smoothed_ce_oracle, uwso_oracle

RNG = np.random.default_rng(7)

B, NS, NT, DS, DT, L, P, H = 2, 9, 16, 16, 24, 4, 2, 3


def _tokens(n, d, r):
    a = RNG.standard_normal((B, n, r))
    b = RNG.standard_normal((r, d))
    return (a @ b + 0.05 * RNG.standard_normal((B, n, d))).astype(np.float32)


def _attn(n):
    logits = RNG.standard_normal((B, H, n, n)).astype(np.float32)
    e = np.exp(logits)
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


def selector_oracle(
    student_tokens, teacher_tokens, teacher_attns, proj_s, proj_t, log_temps
):
    """Reference-faithful selector: returns (mixed_tokens, mixed_attns,
    weights, ranks) keyed by extraction point index."""
    ps = torch.from_numpy(proj_s)
    pt = torch.from_numpy(proj_t)
    lt = torch.from_numpy(log_temps)
    taus = F.softplus(lt)

    t_idx = sorted(teacher_tokens.keys())
    ranks, bases, sws = {}, {}, {}
    for i in t_idx:
        tk = torch.from_numpy(teacher_tokens[i])
        z = tk.reshape(-1, tk.shape[2]) @ pt.T
        # MP rank
        m, d = z.shape
        q = d / m
        cov = (z.T @ z if m >= d else z @ z.T) / m
        eig = torch.linalg.eigvalsh(cov)
        lam = eig.median().item() * (1 + math.sqrt(q)) ** 2
        ranks[i] = min(int((eig > lam).sum().item()), DS - 1)
        zc = z - z.mean(0, keepdim=True)
        _, s, vt = torch.linalg.svd(zc, full_matrices=False)
        bases[i] = vt[: ranks[i]].T
        sws[i] = s[: ranks[i]]

    stacked_tok = torch.stack([torch.from_numpy(teacher_tokens[i]) for i in t_idx])
    stacked_att = torch.stack([torch.from_numpy(teacher_attns[i]) for i in t_idx])

    out = {}
    for p, s_tok in enumerate(student_tokens):
        st = torch.from_numpy(s_tok)
        z_s = st.reshape(-1, DS) @ ps.T
        z_s = z_s - z_s.mean(0, keepdim=True)
        _, _, vt_s = torch.linalg.svd(z_s, full_matrices=False)
        d2 = torch.zeros(len(t_idx))
        for j, i in enumerate(t_idx):
            k = ranks[i]
            u_s = vt_s[:k].T
            sigma = torch.linalg.svdvals(u_s.T @ bases[i])
            eps = torch.finfo(sigma.dtype).eps
            theta = torch.acos(sigma.clamp(max=1 - eps))
            d2[j] = (sws[i] * theta.pow(2)).sum() / sws[i].sum()
        w = F.softmax(-d2 / taus[p], dim=0)
        mixed = (w.view(-1, 1, 1, 1) * stacked_tok).sum(0)
        mixed_attn = (w.view(-1, 1, 1, 1, 1) * stacked_att).sum(0)
        out[p] = (mixed.numpy(), mixed_attn.numpy(), w.numpy(), d2.numpy())
    return out, ranks


@pytest.fixture(scope="module")
def problem():
    student = [_tokens(NS, DS, 5), _tokens(NS, DS, 7)]
    teacher_tok = {i: _tokens(NT, DT, 4 + 3 * i) for i in range(L)}
    teacher_att = {i: _attn(NT + 1) for i in range(L)}
    proj_s = np.linalg.qr(RNG.standard_normal((DS, DS)))[0].astype(np.float32)
    proj_t = np.linalg.qr(RNG.standard_normal((DT, DS)))[0].T.astype(np.float32)
    log_temps = np.log(np.exp([1.0, 1.3]) - 1).astype(np.float32)
    return student, teacher_tok, teacher_att, proj_s, proj_t, log_temps


@pytest.mark.parametrize("backend", ["svd", "gram"])
def test_select_and_mix_matches_oracle(problem, backend):
    student, t_tok, t_att, proj_s, proj_t, log_temps = problem
    ref, ref_ranks = selector_oracle(
        student, t_tok, t_att, proj_s, proj_t, log_temps
    )

    cfg = SelectorConfig(P, DS, DT, backend=backend)
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.stack([jnp.asarray(t_tok[i]) for i in range(L)])
    timp = jnp.stack(
        [
            reduce_attention_importance(jnp.asarray(t_att[i]), has_cls_token=True)
            for i in range(L)
        ]
    )

    mixed_tok, mixed_imp, aux = jax.jit(
        lambda p, b, s, t, i: select_and_mix(p, b, s, t, i, cfg)
    )(params, buffers, st, tt, timp)

    # f32 SVD of ill-conditioned low-rank matrices differs between
    # torch-LAPACK and XLA at the ~1e-3..1e-2 relative level; this is the
    # same deviation the reference shows between its own CUDA and CPU
    # runs. Exact algorithmic parity is proven at 1e-8 in float64 by
    # test_distance_exact_in_float64 below.
    tol = dict(rtol=3e-2, atol=1e-3) if backend == "gram" else dict(rtol=2e-2, atol=5e-4)
    assert np.asarray(aux["ranks"]).tolist() == [ref_ranks[i] for i in range(L)]
    for p in range(P):
        ref_tok, ref_attn, ref_w, ref_d2 = ref[p]
        np.testing.assert_allclose(np.asarray(aux["distances_sq"])[p], ref_d2, **tol)
        np.testing.assert_allclose(np.asarray(aux["mix_weights"])[p], ref_w, **tol)
        # mixed tokens inherit the ~1% f32 weight deviation scaled by
        # token magnitude (~3), so the absolute tolerance is ~0.05.
        np.testing.assert_allclose(np.asarray(mixed_tok)[p], ref_tok, rtol=2e-2, atol=5e-2)
        # reduced-importance mixing == full-attention mixing then reduction
        ref_imp = ref_attn[:, :, 0, 1:].mean(1)
        np.testing.assert_allclose(np.asarray(mixed_imp)[p], ref_imp, rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("backend", ["svd"])
def test_full_basd_loss_matches_oracle(problem, backend):
    student, t_tok, t_att, proj_s, proj_t, log_temps = problem
    num_classes = 10
    logits = RNG.standard_normal((B, num_classes)).astype(np.float32)
    targets = RNG.integers(0, num_classes, B)
    smoothing = 1.0 / num_classes

    # --- oracle: reference pipeline ---
    ref_mix, _ = selector_oracle(student, t_tok, t_att, proj_s, proj_t, log_temps)
    geo_vals = []
    for p in range(P):
        mixed_tok, mixed_attn, _, _ = ref_mix[p]
        tk = torch.from_numpy(mixed_tok)
        aligned = (
            F.interpolate(
                tk.transpose(1, 2), size=NS, mode="linear", align_corners=False
            )
            .transpose(1, 2)
            .numpy()
            if tk.shape[1] != NS
            else mixed_tok
        )
        geo_vals.append(procrustes_oracle(student[p], aligned, mixed_attn, True))
    geo_ref = float(np.mean(geo_vals))
    ce_ref = smoothed_ce_oracle(logits, targets, smoothing)
    loss_ref = uwso_oracle([ce_ref, geo_ref])

    # --- ours ---
    cfg = BASDLossConfig(
        student_dim=DS,
        teacher_dim=DT,
        student_depth=12,
        num_student_tokens=NS,
        num_extraction_points=P,
        label_smoothing=smoothing,
        teacher_has_cls_token=True,
        backend=backend,
    )
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.stack([jnp.asarray(t_tok[i]) for i in range(L)])
    timp = jnp.stack(
        [
            reduce_attention_importance(jnp.asarray(t_att[i]), has_cls_token=True)
            for i in range(L)
        ]
    )

    loss, aux = jax.jit(
        lambda pa, bu, lo, ta, si, ttk, tim: basd_loss(
            pa, bu, lo, ta, si, ttk, tim, cfg
        )
    )(params, buffers, jnp.asarray(logits), jnp.asarray(targets), st, tt, timp)

    np.testing.assert_allclose(float(aux["ce_loss"]), ce_ref, rtol=1e-5)
    np.testing.assert_allclose(float(aux["geo_loss"]), geo_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-3, atol=1e-4)


def test_loss_gradients_flow(problem):
    student, t_tok, t_att, proj_s, proj_t, log_temps = problem
    cfg = BASDLossConfig(
        student_dim=DS,
        teacher_dim=DT,
        student_depth=12,
        num_student_tokens=NS,
        num_extraction_points=P,
        label_smoothing=0.1,
        teacher_has_cls_token=True,
    )
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.stack([jnp.asarray(t_tok[i]) for i in range(L)])
    timp = jnp.stack(
        [
            reduce_attention_importance(jnp.asarray(t_att[i]), has_cls_token=True)
            for i in range(L)
        ]
    )
    logits = jnp.asarray(RNG.standard_normal((B, 10)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, 10, B))

    def f(params, st):
        loss, _ = basd_loss(params, buffers, logits, targets, st, tt, timp, cfg)
        return loss

    g_params, g_st = jax.grad(f, argnums=(0, 1))(params, st)
    assert np.isfinite(np.asarray(g_params["log_temperatures"])).all()
    assert float(jnp.abs(g_params["log_temperatures"]).sum()) > 0
    assert np.isfinite(np.asarray(g_st)).all()
    assert float(jnp.abs(g_st).sum()) > 0


def test_distance_exact_in_float64():
    """In float64 the masked static-shape pipeline matches the
    dynamic-slice torch oracle to ~1e-8: the algorithm is exact, all f32
    deviation is cross-library numerics."""
    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    from basd_tpu.ops.grassmann import (
        rank_mask,
        spectral_grassmann_distance_sq,
    )
    from basd_tpu.ops.linalg import right_singular_vectors
    from basd_tpu.ops.mp_rank import marchenko_pastur_rank

    rng = np.random.default_rng(3)
    ds, dt, m = 12, 20, 64
    t_np = rng.standard_normal((m, 10)) @ rng.standard_normal((10, dt))
    t_np += 0.05 * rng.standard_normal((m, dt))
    s_np = rng.standard_normal((m, 6)) @ rng.standard_normal((6, ds))
    s_np += 0.05 * rng.standard_normal((m, ds))
    proj_s = np.linalg.qr(rng.standard_normal((ds, ds)))[0]
    proj_t = np.linalg.qr(rng.standard_normal((dt, ds)))[0].T

    with enable_x64():
        z_t = jnp.asarray(t_np) @ jnp.asarray(proj_t).T
        k = int(jnp.minimum(marchenko_pastur_rank(z_t), ds - 1))
        zc = z_t - z_t.mean(0, keepdims=True)
        sv_t, basis_t = right_singular_vectors(zc, backend="svd")
        z_s = jnp.asarray(s_np) @ jnp.asarray(proj_s).T
        zsc = z_s - z_s.mean(0, keepdims=True)
        _, basis_s = right_singular_vectors(zsc, backend="svd")
        ours = float(
            spectral_grassmann_distance_sq(
                basis_s, basis_t, sv_t, rank_mask(jnp.asarray(k), ds), backend="svd"
            )
        )

    # torch f64 oracle with dynamic slicing
    zt = torch.from_numpy(np.asarray(t_np @ proj_t.T))
    ztc = zt - zt.mean(0, keepdim=True)
    _, s_t, vt_t = torch.linalg.svd(ztc, full_matrices=False)
    zs = torch.from_numpy(np.asarray(s_np @ proj_s.T))
    zsc_t = zs - zs.mean(0, keepdim=True)
    _, _, vt_s = torch.linalg.svd(zsc_t, full_matrices=False)
    sigma = torch.linalg.svdvals(vt_s[:k] @ vt_t[:k].T)
    eps = torch.finfo(sigma.dtype).eps
    theta = torch.acos(sigma.clamp(max=1 - eps))
    sw = s_t[:k]
    ref = float((sw * theta.pow(2)).sum() / sw.sum())

    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_extraction_layers_match_reference_rounding():
    # Python round() is banker's rounding — the reference relies on it.
    assert extraction_layers(12, 4) == [0, 4, 7, 11]
    assert extraction_layers(12, 1) == [11]
    assert extraction_layers(12, 2) == [0, 11]
    assert extraction_layers(24, 4) == [0, 8, 15, 23]


def test_max_rank_cap_matches_uncapped_when_not_binding(problem):
    """A max_rank cap above every MP rank must not change anything."""
    student, t_tok, t_att, proj_s, proj_t, log_temps = problem
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.stack([jnp.asarray(t_tok[i]) for i in range(L)])
    timp = jnp.stack(
        [
            reduce_attention_importance(jnp.asarray(t_att[i]), has_cls_token=True)
            for i in range(L)
        ]
    )
    full = select_and_mix(
        params, buffers, st, tt, timp, SelectorConfig(P, DS, DT, "gram")
    )
    capped = select_and_mix(
        params, buffers, st, tt, timp,
        SelectorConfig(P, DS, DT, "gram", max_rank=DS - 2),
    )
    # ranks in this fixture are <= 7 << DS-2, so the cap must be inert
    np.testing.assert_array_equal(
        np.asarray(full[2]["ranks"]), np.asarray(capped[2]["ranks"])
    )
    np.testing.assert_allclose(
        np.asarray(full[2]["distances_sq"]),
        np.asarray(capped[2]["distances_sq"]),
        rtol=1e-5, atol=1e-6,
    )


def test_rank_cap_hits_surfaced(problem):
    """aux['rank_cap_hits'] counts layers whose reference-semantics MP rank
    the static cap truncated (VERDICT r2: a binding cap silently changes
    the loss; training must see it)."""
    student, t_tok, t_att, proj_s, proj_t, log_temps = problem
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.stack([jnp.asarray(t_tok[i]) for i in range(L)])
    timp = jnp.stack(
        [
            reduce_attention_importance(jnp.asarray(t_att[i]), has_cls_token=True)
            for i in range(L)
        ]
    )
    _, _, aux_free = select_and_mix(
        params, buffers, st, tt, timp, SelectorConfig(P, DS, DT, "gram")
    )
    assert int(aux_free["rank_cap_hits"]) == 0

    binding_cap = int(np.asarray(aux_free["ranks"]).max()) - 1
    assert binding_cap >= 1
    _, _, aux_cap = select_and_mix(
        params, buffers, st, tt, timp,
        SelectorConfig(P, DS, DT, "gram", max_rank=binding_cap),
    )
    expect = int(np.sum(np.asarray(aux_free["ranks"]) > binding_cap))
    assert int(aux_cap["rank_cap_hits"]) == expect >= 1
    # the svd (reference-parity) branch counts identically
    _, _, aux_svd = select_and_mix(
        params, buffers, st, tt, timp,
        SelectorConfig(P, DS, DT, "svd", max_rank=binding_cap),
    )
    assert int(aux_svd["rank_cap_hits"]) == expect


def test_fused_spectral_path_gradients(problem):
    """The single-eigh fused path must carry finite nonzero gradients into
    the student tokens and temperatures."""
    student, t_tok, t_att, proj_s, proj_t, log_temps = problem
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.stack([jnp.asarray(t_tok[i]) for i in range(L)])
    timp = jnp.stack(
        [
            reduce_attention_importance(jnp.asarray(t_att[i]), has_cls_token=True)
            for i in range(L)
        ]
    )
    cfg = SelectorConfig(P, DS, DT, "gram", max_rank=12)

    def f(params, st):
        mixed, mimp, _ = select_and_mix(params, buffers, st, tt, timp, cfg)
        return jnp.sum(mixed.astype(jnp.float32) ** 2) + jnp.sum(mimp)

    gp, gs = jax.grad(f, argnums=(0, 1))(params, st)
    assert np.isfinite(np.asarray(gp["log_temperatures"])).all()
    assert float(jnp.abs(gp["log_temperatures"]).sum()) > 0
    assert np.isfinite(np.asarray(gs)).all()
    assert float(jnp.abs(gs).sum()) > 0


def test_cnn_to_vit_loss_parity():
    """CNN-to-ViT mode (reference: teacher.py:184-191 + combined loss):
    single teacher layer, uniform attention ones/N — full loss vs the
    torch-formula oracle."""
    rng = np.random.default_rng(31)
    b, ns, nt, ds, dt, num_classes = 2, 9, 16, 16, 32, 10
    p = 2
    student = [
        rng.standard_normal((b, ns, ds)).astype(np.float32) for _ in range(p)
    ]
    feats = rng.standard_normal((b, nt, dt)).astype(np.float32)
    uniform_attn = np.full((b, 1, nt, nt), 1.0 / nt, np.float32)
    proj_s = np.linalg.qr(rng.standard_normal((ds, ds)))[0].astype(np.float32)
    proj_t = np.linalg.qr(rng.standard_normal((dt, ds)))[0].T.astype(np.float32)
    log_temps = np.log(np.exp([1.0, 1.0]) - 1).astype(np.float32)
    logits = rng.standard_normal((b, num_classes)).astype(np.float32)
    targets = rng.integers(0, num_classes, b)

    # oracle: selector over a single layer -> weights are trivially 1,
    # mixed == features; loss = UW-SO(ce, mean_p procrustes)
    geo_vals = []
    for i in range(p):
        tk = torch.from_numpy(feats)
        aligned = (
            F.interpolate(
                tk.transpose(1, 2), size=ns, mode="linear", align_corners=False
            ).transpose(1, 2).numpy()
        )
        geo_vals.append(
            procrustes_oracle(student[i], aligned, uniform_attn, False)
        )
    ce_ref = smoothed_ce_oracle(logits, targets, 0.1)
    loss_ref = uwso_oracle([ce_ref, float(np.mean(geo_vals))])

    cfg = BASDLossConfig(
        student_dim=ds,
        teacher_dim=dt,
        student_depth=12,
        num_student_tokens=ns,
        num_extraction_points=p,
        label_smoothing=0.1,
        teacher_has_cls_token=False,
        backend="svd",
    )
    params = {"log_temperatures": jnp.asarray(log_temps)}
    buffers = {"proj_s": jnp.asarray(proj_s), "proj_t": jnp.asarray(proj_t)}
    st = jnp.stack([jnp.asarray(s) for s in student])
    tt = jnp.asarray(feats)[None]  # (1, B, N, D)
    t_imp = jnp.full((1, b, nt), 1.0 / nt, jnp.float32)  # uniform importance

    loss, aux = basd_loss(
        params, buffers, jnp.asarray(logits), jnp.asarray(targets),
        st, tt, t_imp, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(aux["mix_weights"]), np.ones((p, 1)), atol=1e-6
    )
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-3, atol=1e-4)


def test_centered_gram_outlier_channel_means():
    """ViT/DINOv2 activations carry outlier channels whose means dwarf
    the centered scale. The f32 fast-path centered Gram must not lose
    the centered signal to cancellation: Gramming RAW tokens and
    subtracting M*mu*mu^T stores entries at O(M*mu^2) and leaves
    eps32*M*mu_max^2 of noise (~5e-3 relative at mu/sigma=300, enough
    to flip MP ranks); the shipped shift-identity formulation stays at
    ~1e-4. Locks the fix at a 1e-3 gate (x10 margin both ways)."""
    from basd_tpu.losses.selector import _centered_gram

    rng = np.random.default_rng(11)
    b, n, dt, ds = 16, 50, 96, 48
    m = b * n
    tok = rng.normal(0.0, 1.0, (1, b, n, dt))
    tok[..., 0] += 100.0  # outlier channels, DINOv2-register scale
    tok[..., 1] += 300.0
    tok_bf16 = jnp.asarray(tok, jnp.bfloat16)  # production dtype
    proj = np.linalg.qr(rng.standard_normal((dt, ds)))[0].T
    proj_j = jnp.asarray(proj, jnp.float32)

    gram, mu_p = jax.jit(lambda t, p: _centered_gram(t, p, m))(
        tok_bf16, proj_j
    )
    gram = np.asarray(gram, np.float64)

    # f64 center-then-Gram oracle on the SAME bf16-quantized tokens
    # (isolates the formulation error from input quantization)
    t64 = np.asarray(tok_bf16, np.float64).reshape(1, m, dt)
    t64c = t64 - t64.mean(1, keepdims=True)
    z = t64c @ proj.T
    ref = np.einsum("kmi,kmj->kij", z, z)

    scale = np.abs(ref).max()
    rel = np.abs(gram - ref).max() / scale
    assert rel < 1e-3, f"centered-Gram cancellation regression: {rel:.2e}"
    np.testing.assert_allclose(
        np.asarray(mu_p, np.float64),
        t64.mean(1) @ proj.T,
        rtol=0, atol=2e-3,
    )

    # gradient of the shifted formulation equals the analytic centered-
    # Gram gradient d tr(W G_c)/dT = 2 T_c (P^T W P) for symmetric W
    tok_f32 = jnp.asarray(tok, jnp.float32)
    w_sym = rng.standard_normal((ds, ds))
    w_sym = jnp.asarray(w_sym + w_sym.T, jnp.float32)
    g = jax.grad(
        lambda t: jnp.sum(_centered_gram(t, proj_j, m)[0][0] * w_sym)
    )(tok_f32)
    tc = np.asarray(tok_f32, np.float64) - np.asarray(
        tok_f32, np.float64
    ).mean((1, 2), keepdims=True)
    g_ref = 2.0 * tc @ (proj.T @ np.asarray(w_sym, np.float64) @ proj)
    np.testing.assert_allclose(
        np.asarray(g, np.float64), g_ref,
        rtol=0, atol=2e-2 * np.abs(g_ref).max(),
    )
