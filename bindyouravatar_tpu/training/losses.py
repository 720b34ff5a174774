"""Training losses: v-prediction diffusion loss + the six routing losses.

Ports of reference `train.py:1493-1549` and `models/transformer.py:31-128,
963-1021` / `models/utils.py:672-697`, vectorised over (layer, batch) instead
of python loops.

Grid-layout compatibility: the reference views the flat 17,550 tokens as
(13, 45, 30) — a TRANSPOSED grid (SURVEY.md §2.8) — for the smoothness and
distribution losses, while teacher-forcing uses the true (13, 30, 45).
`compat_transposed=True` (default, matches reference training behavior)
reproduces that exactly; `False` uses the canonical layout with true
left/right semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bce(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Element-wise binary cross entropy (reference `bce_loss`,
    `models/utils.py:694-697`; pred clamped, target not)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -target * jnp.log(p) - (1.0 - target) * jnp.log(1.0 - p)


def focal_loss(pred, target, alpha=0.5, gamma=2.0, eps=1e-6):
    """Reference `focal_loss` (`models/utils.py:672-692`; defined, unused)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    t = jnp.clip(target, eps, 1.0 - eps)
    ce = -t * jnp.log(p) - (1.0 - t) * jnp.log(1.0 - p)
    pt = p * t + (1.0 - p) * (1.0 - t)
    return (alpha * t + (1 - alpha) * (1 - t)) * (1 - pt) ** gamma * ce


def _as_grid(routing: jnp.ndarray, grid: Tuple[int, int, int],
             compat_transposed: bool) -> jnp.ndarray:
    """[..., S, I] -> [..., T, A, B, I] where (A,B) = (W,H) in compat mode
    (reference's `.view(13, 45, 30, 2)`) or (H,W) canonically."""
    t, h, w = grid
    lead = routing.shape[:-2]
    i = routing.shape[-1]
    if compat_transposed:
        return routing.reshape(lead + (t, w, h, i))
    return routing.reshape(lead + (t, h, w, i))


def routing_bce_loss(routing_logits: jnp.ndarray,
                     teacher: jnp.ndarray) -> jnp.ndarray:
    """BCE vs the CLEAN OR-reduced teacher (reference `transformer.py:835-850`;
    the noisy copy is only what gets injected).  routing_logits:
    [L, B, S, I]; teacher: [B, S, I].  Mean over everything, NaN-guarded."""
    per_layer = bce(routing_logits, teacher[None]).mean(axis=(2, 3))  # [L, B]
    loss = per_layer.mean(axis=0)                                     # [B]
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
    return loss.mean()


def consistency_loss(routing_logits: jnp.ndarray) -> jnp.ndarray:
    """Inter-layer variance (reference `transformer.py:971-981`)."""
    if routing_logits.shape[0] < 2:
        return jnp.zeros(())
    var = jnp.var(routing_logits, axis=0, ddof=1)   # torch.var default unbiased
    return var.mean(axis=(1, 2)).mean()


def temporal_diff_loss(routing_logits: jnp.ndarray, grid: Tuple[int, int, int],
                       compat_transposed: bool = True) -> jnp.ndarray:
    """L2 norm of frame-to-frame differences (reference `:998-1000`)."""
    g = _as_grid(routing_logits, grid, compat_transposed)   # [L,B,T,A,B2,I]
    d = g[:, :, 1:] - g[:, :, :-1]
    per = jnp.sqrt(jnp.sum(d.astype(jnp.float32) ** 2, axis=(2, 3, 4, 5)) + 1e-12)
    return per.mean(axis=0).mean()   # sum layers / L, mean batch


def spatial_diff_loss(routing_logits: jnp.ndarray, grid: Tuple[int, int, int],
                      compat_transposed: bool = True) -> jnp.ndarray:
    """L2 norms of axis-wise spatial differences (reference `:1003-1011`)."""
    g = _as_grid(routing_logits, grid, compat_transposed)
    dh = g[:, :, :, 1:] - g[:, :, :, :-1]
    dw = g[:, :, :, :, 1:] - g[:, :, :, :, :-1]
    nh = jnp.sqrt(jnp.sum(dh.astype(jnp.float32) ** 2, axis=(2, 3, 4, 5)) + 1e-12)
    nw = jnp.sqrt(jnp.sum(dw.astype(jnp.float32) ** 2, axis=(2, 3, 4, 5)) + 1e-12)
    return (nh + nw).mean(axis=0).mean()


def _side_sums(g: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """g: [L,B,T,A,B2,I] -> masked means over the first/last `half` slices of
    axis A (the reference's 'left'/'right' 22 columns, `transformer.py:53-66`)."""
    a = g.shape[3]
    half = (a - 1) // 2
    left = g[:, :, :, :half]
    right = g[:, :, :, half + 1:]
    lm = (left * (left >= 0.01)).sum(axis=(3, 4)) / (half * g.shape[4])
    rm = (right * (right >= 0.01)).sum(axis=(3, 4)) / (half * g.shape[4])
    return lm, rm          # each [L, B, T, I]


def spatial_distribution_loss(routing_logits: jnp.ndarray,
                              grid: Tuple[int, int, int],
                              compat_transposed: bool = True) -> jnp.ndarray:
    """Penalise mass on both sides simultaneously (reference `:31-75`)."""
    g = _as_grid(routing_logits, grid, compat_transposed)
    lm, rm = _side_sums(g)
    return (lm * rm).mean(axis=(2, 3)).mean(axis=0).mean()


def id_distribution_loss(routing_logits: jnp.ndarray,
                         grid: Tuple[int, int, int],
                         compat_transposed: bool = True) -> jnp.ndarray:
    """Penalise both ids on the same side (reference `:77-128`)."""
    g = _as_grid(routing_logits, grid, compat_transposed)
    lm, rm = _side_sums(g)     # [L, B, T, I]
    left = (lm[..., 0] * lm[..., 1]).mean(axis=2)    # [L, B]
    right = (rm[..., 0] * rm[..., 1]).mean(axis=2)
    return ((left + right) / 2.0).mean(axis=0).mean()


def diffusion_loss(
    model_output: jnp.ndarray,
    noisy_latents: jnp.ndarray,
    clean_latents: jnp.ndarray,
    timesteps: jnp.ndarray,
    schedule,
    dense_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """v-prediction loss with SNR-style weight (reference `train.py:1509-1525`).

    The reference's `scheduler.get_velocity(model_output, noisy, t)` (with
    diffusers' (sample, noise) argument order) computes
    `sqrt(a)*noisy - sqrt(1-a)*model_output` — the x0 reconstruction from a
    v-prediction.  Target = clean latents; weight = 1/(1-abar_t).  Optional
    per-token dense mask restricts the loss to face regions."""
    pred = schedule.get_velocity(noisy_latents, model_output, timesteps)
    w = schedule.loss_weight(timesteps)
    w = w.reshape(w.shape + (1,) * (pred.ndim - w.ndim))
    sq = w * (pred - clean_latents.astype(jnp.float32)) ** 2
    if dense_mask is not None:
        m = dense_mask.astype(jnp.float32)
        if m.ndim == sq.ndim - 1:       # [B,T,H,W] -> broadcast over channels
            m = m[:, :, None]
        m = jnp.broadcast_to(m, sq.shape)
        return (sq * m).sum() / jnp.maximum(m.sum(), 1.0)
    b = sq.shape[0]
    return sq.reshape(b, -1).mean(axis=1).mean()
