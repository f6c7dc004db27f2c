"""Independent PyTorch/NumPy oracle implementations of the BASD math.

These are written from the published formulas (MP threshold, principal
angles, Procrustes with nuclear norm, UW-SO) with the same conventions the
reference uses, and serve as the ground truth for float-tolerance parity
tests of the JAX/TPU implementations. They intentionally use the dynamic
shapes / per-layer Python loops the reference relies on, so they exercise a
completely different code path than the static-masked batched TPU build.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def mp_rank_oracle(features: np.ndarray) -> int:
    f = torch.from_numpy(np.asarray(features, np.float64)).float()
    m, d = f.shape
    q = d / m
    cov = (f.T @ f if m >= d else f @ f.T) / m
    eig = torch.linalg.eigvalsh(cov)
    sigma2 = eig.median().item()
    lam = sigma2 * (1 + math.sqrt(q)) ** 2
    return int((eig > lam).sum().item())


def subspace_oracle(z: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    zt = torch.from_numpy(np.asarray(z, np.float32))
    zt = zt - zt.mean(dim=0, keepdim=True)
    _, s, vt = torch.linalg.svd(zt, full_matrices=False)
    return vt[:k].T.numpy(), s[:k].numpy()


def grassmann_d2_oracle(
    vs_full: np.ndarray, basis_t: np.ndarray, svals_t: np.ndarray, k: int
) -> float:
    """Spectrally-weighted squared principal-angle distance for one pair."""
    u_s = torch.from_numpy(vs_full[:, :k])
    u_t = torch.from_numpy(basis_t[:, :k])
    sigma = torch.linalg.svdvals(u_s.T @ u_t)
    eps = torch.finfo(sigma.dtype).eps
    theta = torch.acos(sigma.clamp(max=1.0 - eps))
    sw = torch.from_numpy(svals_t[:k])
    return float((sw * theta.pow(2)).sum() / sw.sum())


def interp1d_oracle(x: np.ndarray, target: int) -> np.ndarray:
    """F.interpolate(mode='linear', align_corners=False) along last axis."""
    t = torch.from_numpy(np.asarray(x, np.float32))
    squeeze = t.dim() == 2
    if squeeze:
        t = t.unsqueeze(1)
    out = F.interpolate(t, size=target, mode="linear", align_corners=False)
    if squeeze:
        out = out.squeeze(1)
    return out.numpy()


def procrustes_oracle(
    s_tokens: np.ndarray,
    t_tokens: np.ndarray,
    attn: np.ndarray,
    has_cls: bool,
) -> float:
    """Attention-weighted Procrustes from a FULL attention map."""
    s = torch.from_numpy(np.asarray(s_tokens, np.float32))
    t = torch.from_numpy(np.asarray(t_tokens, np.float32))
    a = torch.from_numpy(np.asarray(attn, np.float32))
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
    nuc = torch.linalg.matrix_norm(cross, ord="nuc")
    return float((tr_s + tr_t - 2.0 * nuc).mean())


def uwso_oracle(values: list[float]) -> float:
    v = torch.tensor(values, dtype=torch.float32)
    eps = torch.finfo(torch.float32).eps
    inv = 1.0 / v.clamp(min=eps)
    w = inv / inv.sum()
    return float((w * v).sum())


def smoothed_ce_oracle(
    logits: np.ndarray, targets: np.ndarray, smoothing: float
) -> float:
    lt = torch.from_numpy(np.asarray(logits, np.float32))
    if targets.ndim == 1:
        tt = torch.from_numpy(np.asarray(targets, np.int64))
    else:
        tt = torch.from_numpy(np.asarray(targets, np.float32))
    return float(
        torch.nn.functional.cross_entropy(lt, tt, label_smoothing=smoothing)
    )
