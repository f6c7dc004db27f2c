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

    def set_eval_params(self):
        with torch.no_grad():
            for p, x in zip(self.params, self.x):
                p.copy_(x)

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


# --------------------------------------------------- epoch-loop parity


@pytest.mark.slow
def test_epoch_loop_matches_torch_reference(tmp_path):
    """The REAL ``Trainer`` epoch loop — dual views -> MixUp/CutMix ->
    distillation step -> smoothed-CE validation -> checkpoint — tracks a
    torch reference mirror over 3 epochs x 8 batches on synthetic/tiny
    (VERDICT r2 directive #2, horizon extended r5 per VERDICT r4 #8;
    reference ``src/training/trainer.py:125-211``). Per-epoch val
    ACCURACY parity is asserted to within one borderline sample, train /
    val losses to 5e-3 relative, and final eval-mode parameters to 1e-2.

    The mirror replays the trainer's exact RNG stream and shuffled batch
    order, regenerates the SAME dual views and MixUp draws with the JAX
    augmentation functions (whose torchvision/PIL parity is locked
    op-by-op in tests/test_augment.py), rounds inputs through bf16
    exactly as the trainer's step does, and runs the torch reference
    step (teacher extract -> selector -> Procrustes -> UW-SO ->
    schedule-free AdamW). Asserted: per-epoch train loss, val smoothed
    CE, val accuracy, and final eval-parameter closeness.
    """
    from basd_tpu.data import augment as aug
    from basd_tpu.models.registry import ModelBundle, _vit_info
    from basd_tpu.parallel.mesh import make_mesh
    from basd_tpu.training.trainer import Trainer
    from tests.test_train_e2e import tiny_config

    IMG2, BS, EPOCHS, LIMIT, EVAL_LIMIT = 32, 16, 3, 8, 3
    S_P, S_D, T_P, T_D, DEPTH, HEADS = 16, 48, 8, 64, 3, 2
    C = 10

    torch.manual_seed(7)
    student_t = _TorchViT(IMG2, S_P, S_D, DEPTH, HEADS, 2.0, C)
    teacher_t = _TorchViT(IMG2, T_P, T_D, DEPTH, HEADS, 2.0, 1).eval()
    for p in teacher_t.parameters():
        p.requires_grad_(False)

    def to_bundle(tm, patch, d, classes, name):
        cfg = ViTConfig(
            img_size=IMG2, patch_size=patch, embed_dim=d, depth=DEPTH,
            num_heads=HEADS, mlp_ratio=2.0, num_classes=classes,
            drop_path_rate=0.0,
        )
        module = VisionTransformer(
            cfg, importance_mode="cls" if classes == 1 else None
        )
        params = vit_params_from_torch(
            {k: v.numpy() for k, v in tm.timm_state_dict().items()},
            DEPTH, False,
        )
        if classes == 0:
            params.pop("head", None)
        return ModelBundle(name, module, cfg, _vit_info(cfg)), params

    s_bundle, s_params = to_bundle(student_t, S_P, S_D, C, "s")
    t_bundle, t_params = to_bundle(teacher_t, T_P, T_D, 1, "t")

    d_stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    t_stats = ((0.4, 0.4, 0.4), (0.3, 0.3, 0.3))
    cfg = tiny_config(
        tmp_path,
        **{
            "data.batch_size": BS,
            "data.limit_train_batches": LIMIT,
            "data.limit_eval_batches": EVAL_LIMIT,
            "training.num_epochs": EPOCHS,
            "basd.spectral_backend": "svd",
            "model.drop_path_rate": 0.0,
        },
    )
    mesh = make_mesh(data=1)
    trainer = Trainer(
        cfg,
        student_bundle=s_bundle,
        student_params=jax.tree_util.tree_map(jnp.asarray, s_params),
        teacher_bundle=t_bundle,
        teacher_vars={"params": jax.tree_util.tree_map(jnp.asarray, t_params)},
        mesh=mesh,
        dataset_stats=d_stats,
        teacher_stats=t_stats,
    )
    selector_t = _TorchSelector(
        np.asarray(trainer.sel_buffers["proj_s"]),
        np.asarray(trainer.sel_buffers["proj_t"]),
        cfg.basd.num_extraction_points,
    )
    extraction = trainer.token_layers
    n_s_tokens = (IMG2 // S_P) ** 2
    smooth = cfg.training.label_smoothing

    from basd_tpu.data.sources import SyntheticSource

    src = SyntheticSource("synthetic/tiny")
    trainer.train(src, start_epoch=0)  # the REAL loop, incl. checkpoints

    # ------------------------------------------------------ torch mirror
    params_t = list(student_t.parameters()) + [selector_t.log_temperatures]
    opt_t = _TorchScheduleFree(
        params_t, cfg.training.learning_rate, cfg.training.weight_decay
    )

    def thru_bf16(x):  # the trainer's in-step .astype(bf16) input rounding
        a = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
        return torch.from_numpy(a).permute(0, 3, 1, 2).contiguous()

    r = round(IMG2 / cfg.data.eval_crop_ratio)
    rng = jax.random.PRNGKey(cfg.run.seed)
    mirror_train_loss, mirror_val_loss, mirror_val_acc = [], [], []
    for epoch in range(EPOCHS):
        batches = src.load_batches(
            "train", BS, r, shuffle=True,
            seed=cfg.run.seed * 100003 + epoch, drop_last=True,
        )
        loss_sum, total = 0.0, 0
        for i, batch in enumerate(batches):
            if i >= LIMIT:
                break
            rng, step_rng = jax.random.split(rng)
            k_view, k_mix, _ = jax.random.split(step_rng, 3)
            clean, augd = aug.make_train_views(
                k_view, jnp.asarray(batch["image"]), IMG2, d_stats, t_stats
            )
            mixed, mixed_targets = aug.mixup_cutmix(
                k_mix, augd, jnp.asarray(batch["label"]), C, num_shards=1
            )
            opt_t.set_train_params()
            with torch.no_grad():
                _, t_tokens, t_attns = teacher_t(thru_bf16(clean))
            logits_t, s_all, _ = student_t(thru_bf16(mixed))
            s_list = [s_all[j] for j in extraction]
            loss_t, _, _ = _torch_basd_loss(
                logits_t, torch.from_numpy(np.asarray(mixed_targets)),
                s_list, t_tokens, t_attns, selector_t, n_s_tokens, smooth,
            )
            for p in params_t:
                p.grad = None
            loss_t.backward()
            opt_t.step()
            loss_sum += float(loss_t) * BS
            total += BS
        mirror_train_loss.append(loss_sum / total)

        # validation with eval (x) params and smoothed CE, like the
        # trainer (reference trainer.py:184-188)
        opt_t.set_eval_params()
        ce_sum, top1, n_val = 0.0, 0, 0
        for i, batch in enumerate(
            src.load_batches("eval", BS, r, shuffle=False, seed=0,
                             drop_last=False)
        ):
            if i >= EVAL_LIMIT:
                break
            x = aug.make_eval_view(jnp.asarray(batch["image"]), IMG2, d_stats)
            with torch.no_grad():
                logits, _, _ = student_t(thru_bf16(x))
            labels = torch.from_numpy(np.asarray(batch["label"])).long()
            ce_sum += float(
                F.cross_entropy(logits, labels, label_smoothing=smooth,
                                reduction="sum")
            )
            top1 += int((logits.argmax(-1) == labels).sum())
            n_val += len(labels)
        mirror_val_loss.append(ce_sum / n_val)
        mirror_val_acc.append(100.0 * top1 / n_val)

    hist = trainer.metrics_history
    np.testing.assert_allclose(
        hist["train_loss"], mirror_train_loss, rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        hist["loss"], mirror_val_loss, rtol=5e-3, atol=5e-4
    )
    # accuracy is a discrete count; allow one borderline sample per epoch
    for e in range(EPOCHS):
        assert abs(hist["val_acc"][e] - mirror_val_acc[e]) <= 100.0 / (
            EVAL_LIMIT * BS
        ) + 1e-6

    # final eval-parameter closeness, relative to training movement
    x_eval = sf.eval_params(trainer.opt_state)
    j_cls = np.asarray(x_eval["student"]["cls_token"]).ravel()
    t_cls = opt_t.x[[id(p) for p in params_t].index(
        id(student_t.cls_token))].numpy().ravel()
    np.testing.assert_allclose(j_cls, t_cls, rtol=1e-2, atol=1e-4)
    j_tau = np.asarray(x_eval["basd"]["log_temperatures"])
    np.testing.assert_allclose(j_tau, opt_t.x[-1].numpy(), rtol=1e-2,
                               atol=1e-4)

    # the loop's checkpoint artifacts exist (best + latest + final weights)
    ckpt_dir = tmp_path / "tiny" / "checkpoints"
    assert (ckpt_dir / "latest").exists()
    assert (ckpt_dir / "final_model_weights").exists()
