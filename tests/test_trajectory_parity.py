"""Trajectory parity: the full BASD train step (student fwd -> selector ->
Procrustes -> UW-SO -> schedule-free AdamW) agrees with an independent
PyTorch implementation of the reference step over many optimizer steps.

This is the strongest air-gapped proxy for the north star's "top-1 within
0.2% / per-step loss parity" (BASELINE.md): both frameworks start from
identical weights (ported), consume identical batches, and must produce
matching loss trajectories AND matching parameters after 40 steps with
``spectral_backend='svd'``.

The torch side below is written from the reference semantics
(``src/training/trainer.py:125-168``, ``src/losses/layer_selector.py``,
``src/losses/relational.py``, ``src/losses/combined.py``) with the
dynamic-shape per-layer Python loops the reference uses — a completely
different code path than the batched static-masked JAX build.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from basd_tpu.losses import BASDLossConfig, basd_loss, init_basd_loss
from basd_tpu.models.port import vit_params_from_torch
from basd_tpu.models.vit import ViTConfig, VisionTransformer
from basd_tpu.training import schedulefree as sf
from tests.test_models import _TorchViT

# tiny-but-representative: teacher token count (64) != student (16) so the
# interpolation paths are exercised; D_t (24) != D_s (16) so the
# rectangular nuclear norm is exercised.
IMG = 16
S_PATCH, S_DIM, S_DEPTH, S_HEADS = 4, 16, 3, 2
T_PATCH, T_DIM, T_DEPTH, T_HEADS = 2, 24, 3, 2
NUM_CLASSES = 7
P_POINTS = 2
BATCH = 4
STEPS = 40
LR, WD, SMOOTH = 1e-3, 0.05, 0.1
F32_EPS = float(np.finfo(np.float32).eps)


# ------------------------------------------------------------- torch side


def _torch_mp_rank(z: torch.Tensor) -> int:
    """reference marchenko_pastur_rank (layer_selector.py:8-20)."""
    m, d = z.shape
    q = d / m
    cov = (z.T @ z if m >= d else z @ z.T) / m
    eig = torch.linalg.eigvalsh(cov)
    sigma2 = eig.median()
    lam = sigma2 * (1.0 + math.sqrt(q)) ** 2
    return int((eig > lam).sum().item())


def _torch_align_tokens(x: torch.Tensor, n: int) -> torch.Tensor:
    """reference _align_token_count (combined.py:9-14)."""
    if x.shape[1] == n:
        return x
    return F.interpolate(
        x.transpose(1, 2), size=n, mode="linear", align_corners=False
    ).transpose(1, 2)


def _torch_relational(s, t, attn, has_cls):
    """reference geometric_relational_loss (relational.py:5-50),
    differentiable."""
    s = s.float()
    t = t.float()
    a = attn.float()
    n_s = s.shape[1]
    w = a[:, :, 0, 1:].mean(dim=1) if has_cls else a.mean(dim=(1, 2))
    if w.shape[1] != n_s:
        w = F.interpolate(
            w.unsqueeze(1), size=n_s, mode="linear", align_corners=False
        ).squeeze(1)
    w = w / w.sum(dim=-1, keepdim=True)
    mu_s = (w.unsqueeze(-1) * s).sum(dim=1, keepdim=True)
    mu_t = (w.unsqueeze(-1) * t).sum(dim=1, keepdim=True)
    ws = w.unsqueeze(-1).sqrt()
    s_w = ws * (s - mu_s)
    t_w = ws * (t - mu_t)
    tr_s = (s_w * s_w).sum(dim=(1, 2))
    tr_t = (t_w * t_w).sum(dim=(1, 2))
    cross = torch.bmm(s_w.transpose(1, 2), t_w)
    nuc = torch.linalg.svdvals(cross).sum(-1)
    return (tr_s + tr_t - 2.0 * nuc).mean()


class _TorchSelector(torch.nn.Module):
    """reference GrassmannianLayerSelector (layer_selector.py:40-152) with
    the frozen projections injected (shared numerically with JAX)."""

    def __init__(self, proj_s, proj_t, num_points):
        super().__init__()
        self.register_buffer("proj_s", torch.from_numpy(np.asarray(proj_s)))
        self.register_buffer("proj_t", torch.from_numpy(np.asarray(proj_t)))
        self.log_temperatures = torch.nn.Parameter(
            torch.full((num_points,), math.log(math.e - 1.0))
        )

    def forward(self, student_list, teacher_list, attn_list):
        d_s = self.proj_s.shape[0]
        with torch.no_grad():
            ranks, bases, svals = [], [], []
            for t in teacher_list:
                z = t.float().reshape(-1, t.shape[-1]) @ self.proj_t.T
                k = min(_torch_mp_rank(z), d_s - 1)
                zc = z - z.mean(dim=0, keepdim=True)
                _, s_vals, vh = torch.linalg.svd(zc, full_matrices=False)
                ranks.append(k)
                bases.append(vh[:k].T)  # (d_s, k)
                svals.append(s_vals[:k])
        t_stack = torch.stack(teacher_list)  # (L, B, N_t, D_t)
        a_stack = torch.stack(attn_list)  # (L, B, H, N, N)
        mixed_tok, mixed_attn = [], []
        for p, s_tok in enumerate(student_list):
            z = s_tok.float().reshape(-1, d_s) @ self.proj_s.T
            zc = z - z.mean(dim=0, keepdim=True)
            _, _, vh_s = torch.linalg.svd(zc, full_matrices=False)  # grads!
            d2 = []
            for l in range(len(teacher_list)):
                k = ranks[l]
                sigma = torch.linalg.svdvals(vh_s[:k, :] @ bases[l])
                theta = torch.acos(sigma.clamp(max=1.0 - F32_EPS))
                sw = svals[l]
                d2.append((sw * theta.pow(2)).sum() / sw.sum())
            d2 = torch.stack(d2)
            tau = F.softplus(self.log_temperatures[p])
            wts = torch.softmax(-d2 / tau, dim=0)
            mixed_tok.append(torch.einsum("l,lbnd->bnd", wts, t_stack))
            mixed_attn.append(torch.einsum("l,lbhnm->bhnm", wts, a_stack))
        return mixed_tok, mixed_attn


def _torch_basd_loss(logits, targets, student_list, teacher_list, attn_list,
                     selector, n_student_tokens, smoothing):
    """reference BASDLoss.forward (combined.py:48-85)."""
    ce = F.cross_entropy(logits, targets, label_smoothing=smoothing)
    mixed_tok, mixed_attn = selector(student_list, teacher_list, attn_list)
    geos = []
    for p, s_tok in enumerate(student_list):
        t_al = _torch_align_tokens(mixed_tok[p], n_student_tokens)
        geos.append(_torch_relational(s_tok, t_al, mixed_attn[p], True))
    geo = torch.stack(geos).mean()
    vals = torch.stack([ce, geo])
    inv = 1.0 / vals.detach().clamp(min=F32_EPS)
    w = inv / inv.sum()
    return (w * vals).sum(), float(ce), float(geo)


class _TorchScheduleFree:
    """AdamWScheduleFree (Defazio et al.) in the explicit (x, z) form —
    algebraically the torch package's y/z scheme (see
    basd_tpu/training/schedulefree.py docstring)."""

    def __init__(self, params, lr, wd, b1=0.9, b2=0.999, eps=1e-8):
        self.params = list(params)
        self.x = [p.detach().clone() for p in self.params]
        self.z = [p.detach().clone() for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]
        self.lr, self.wd, self.b1, self.b2, self.eps = lr, wd, b1, b2, eps
        self.k = 0
        self.lr_max = 0.0
        self.weight_sum = 0.0

    def set_train_params(self):
        with torch.no_grad():
            for p, x, z in zip(self.params, self.x, self.z):
                p.copy_(self.b1 * x + (1.0 - self.b1) * z)

    def step(self):
        self.k += 1
        lr_t = self.lr * math.sqrt(1.0 - self.b2**self.k)
        self.lr_max = max(self.lr_max, lr_t)
        weight = self.lr_max**2.0
        self.weight_sum += weight
        c = weight / self.weight_sum if self.weight_sum > 0 else 0.0
        with torch.no_grad():
            for p, x, z, v in zip(self.params, self.x, self.z, self.v):
                g = p.grad
                v.mul_(self.b2).addcmul_(g, g, value=1.0 - self.b2)
                u = g / (v.sqrt() + self.eps) + self.wd * p
                z.add_(u, alpha=-lr_t)
                x.mul_(1.0 - c).add_(z, alpha=c)


# --------------------------------------------------------------- fixture


def _make_models():
    torch.manual_seed(3)
    student_t = _TorchViT(IMG, S_PATCH, S_DIM, S_DEPTH, S_HEADS, 2.0,
                          NUM_CLASSES)
    teacher_t = _TorchViT(IMG, T_PATCH, T_DIM, T_DEPTH, T_HEADS, 2.0, 1)
    teacher_t.eval()
    for p in teacher_t.parameters():
        p.requires_grad_(False)

    def to_jax(tm, patch, d, depth, heads, classes):
        cfg = ViTConfig(
            img_size=IMG, patch_size=patch, embed_dim=d, depth=depth,
            num_heads=heads, mlp_ratio=2.0, num_classes=classes,
            drop_path_rate=0.0,
        )
        module = VisionTransformer(
            cfg, importance_mode="cls" if classes == 1 else None
        )
        params = vit_params_from_torch(
            {k: v.numpy() for k, v in tm.timm_state_dict().items()},
            depth, False,
        )
        if classes == 0:
            params.pop("head", None)
        return module, params

    student_j, s_params = to_jax(student_t, S_PATCH, S_DIM, S_DEPTH,
                                 S_HEADS, NUM_CLASSES)
    teacher_j, t_params = to_jax(teacher_t, T_PATCH, T_DIM, T_DEPTH,
                                 T_HEADS, 1)
    return student_t, teacher_t, student_j, s_params, teacher_j, t_params


@pytest.mark.slow
def test_train_trajectory_matches_torch_reference():
    (student_t, teacher_t, student_j, s_params, teacher_j,
     t_params) = _make_models()

    n_s_tokens = (IMG // S_PATCH) ** 2
    loss_cfg = BASDLossConfig(
        student_dim=S_DIM, teacher_dim=T_DIM, student_depth=S_DEPTH,
        num_student_tokens=n_s_tokens, num_extraction_points=P_POINTS,
        label_smoothing=SMOOTH, teacher_has_cls_token=True, backend="svd",
    )
    sel_params, sel_buffers = init_basd_loss(jax.random.PRNGKey(5), loss_cfg)
    extraction = tuple(loss_cfg.token_layers)

    selector_t = _TorchSelector(
        np.asarray(sel_buffers["proj_s"]), np.asarray(sel_buffers["proj_t"]),
        P_POINTS,
    )

    sf_cfg = sf.ScheduleFreeConfig(learning_rate=LR, weight_decay=WD)
    trainable = {"student": s_params, "basd": sel_params}
    opt_state = sf.init(jax.tree_util.tree_map(jnp.asarray, trainable))

    t_vars = {"params": t_params}

    @jax.jit
    def jax_step(opt_state, images, labels):
        t_out = teacher_j.apply(t_vars, images, deterministic=True)
        y = sf.train_params(opt_state, sf_cfg)

        def loss_fn(tr):
            out = student_j.apply(
                {"params": tr["student"]}, images, deterministic=True
            )
            s_int = out["tokens"][jnp.asarray(extraction)]
            loss, aux = basd_loss(
                tr["basd"], sel_buffers, out["logits"], labels, s_int,
                t_out["tokens"], t_out["importance"], loss_cfg,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(y)
        opt_state = sf.update(opt_state, grads, sf_cfg, y=y)
        return opt_state, loss, aux["ce_loss"], aux["geo_loss"]

    # torch optimizer over student params + selector temperature
    params_t = list(student_t.parameters()) + [selector_t.log_temperatures]
    opt_t = _TorchScheduleFree(params_t, LR, WD)

    init_cls = student_t.cls_token.detach().clone().numpy().ravel()

    rng = np.random.default_rng(17)
    losses_j, losses_t = [], []
    for step in range(STEPS):
        images = rng.standard_normal((BATCH, IMG, IMG, 3)).astype(np.float32)
        labels = rng.integers(0, NUM_CLASSES, (BATCH,)).astype(np.int32)

        # --- torch ---
        opt_t.set_train_params()
        x_t = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
        with torch.no_grad():
            _, t_tokens, t_attns = teacher_t(x_t)
        logits_t, s_tokens_all, _ = student_t(x_t)
        s_list = [s_tokens_all[i] for i in extraction]
        loss_t, _, _ = _torch_basd_loss(
            logits_t, torch.from_numpy(labels).long(), s_list, t_tokens,
            t_attns, selector_t, n_s_tokens, SMOOTH,
        )
        for p in params_t:
            p.grad = None
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t))

        # --- jax ---
        opt_state, loss_j, ce_j, geo_j = jax_step(
            opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses_j.append(float(loss_j))

    losses_j = np.asarray(losses_j)
    losses_t = np.asarray(losses_t)
    # per-step loss parity at float tolerance over the whole trajectory
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4)

    # final parameter agreement: eval params (x) of a representative set
    x_eval = sf.eval_params(opt_state)
    j_cls = np.asarray(x_eval["student"]["cls_token"]).ravel()
    t_cls = opt_t.x[[id(p) for p in params_t].index(
        id(student_t.cls_token))].numpy().ravel()
    np.testing.assert_allclose(j_cls, t_cls, rtol=5e-3, atol=5e-5)

    j_tau = np.asarray(x_eval["basd"]["log_temperatures"])
    t_tau = opt_t.x[-1].numpy()
    np.testing.assert_allclose(j_tau, t_tau, rtol=5e-3, atol=5e-5)

    # drift must be small relative to how far training moved the params
    moved = np.linalg.norm(t_cls - init_cls)
    assert np.linalg.norm(j_cls - t_cls) <= 0.05 * max(moved, 1e-6)
