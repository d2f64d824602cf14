"""Precise BatchNorm statistics finalization ("precise BN").

Why this exists: Keras-style training (reference
`training/training.py:401-407`) leaves the FINAL checkpoint with
whatever the momentum-0.99 rolling BatchNorm statistics happen to hold —
a geometric average over the whole training trajectory, including the
init values (weight ``0.99^steps``: still 9% after 240 steps) and every
early-training activation distribution. The eval-mode forward then
normalizes with statistics that do not match the trained weights; on
low-variance regions (e.g. the dark vitreous above the ILM) the stale
``var`` — inflated toward its 1.0 init — washes out exactly the
low-contrast activations that discriminate the boundary. Measured on
the synthetic layered task (r4, PLAN.md): train-mode (batch-stats) dice
0.95-0.99 vs eval-mode 0.51-0.89 with rolling stats, restored to
0.95-0.99 after recomputation; at flagship scale the stale stats cost
92 px of ILM boundary MAE. The upstream reference has the SAME disease
(its seed-0 convergence run scored 0.53 eval dice with a 0.95-capable
model) — this module is a quality fix beyond reference parity, on by
default (``TrainingParams.bn_precise_stats=False`` restores
reference-exact finalization).

What it does: after training picks its final weights, recompute every
BatchNorm's running statistics as EXACT population statistics of the
training data under those final weights (the "precise BN" technique).
One pass over the data: each batch's raw statistics are recovered
algebraically from the module's momentum-updated mutable output
(``s_b = (new_ra - m * ra) / (1 - m)``, exact for any known momentum),
then aggregated across equal-size batches with the law of total
variance (``mean = E_b[mean_b]``,
``var = E_b[var_b + mean_b^2] - mean^2``).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

# models/unet.py ConvBlock pins momentum=0.99 (the Keras
# BatchNormalization default the reference trains with).
BN_MOMENTUM = 0.99


def _is_bn_stats(node) -> bool:
    return isinstance(node, Mapping) and set(node.keys()) == {"mean", "var"}


def _tree_bn_map(fn, *trees):
    """Map ``fn(*bn_dicts) -> bn_dict`` over every BatchNorm
    {'mean', 'var'} node of parallel nested-dict trees."""
    head = trees[0]
    if _is_bn_stats(head):
        return fn(*trees)
    if isinstance(head, Mapping):
        return {k: _tree_bn_map(fn, *(t[k] for t in trees)) for k in head}
    raise TypeError(f"unexpected batch_stats node: {type(head)}")


def compute_precise_batch_stats(
    module,
    params,
    batch_stats,
    batches,
    rng,
    momentum: float = BN_MOMENTUM,
):
    """Exact population BN statistics of ``batches`` under ``params``.

    Args:
      module: the training compute module (``UNetModule`` or
        ``S2DTrainForward`` — anything honoring the
        ``apply(variables, x, training=True, rngs={"dropout"},
        mutable=["batch_stats"])`` contract with the shared stats tree).
      params / batch_stats: the final weights and any same-shaped stats
        tree (used only as the recurrence anchor; values cancel out of
        the algebra exactly).
      batches: iterable of equal-size input batches (already
        preprocessed, i.e. what the module's forward consumes).
      rng: dropout key. Stats are collected under the training-mode
        forward — the only mode in which Flax BN computes batch
        statistics — so layers downstream of a Dropout see the
        inverted-dropout distribution: their MEANS are unbiased, but
        their variances are biased high relative to the eval-mode
        (dropout-off) distribution. That is the SAME bias the rolling
        statistics carried (Keras's `fit` collects stats with dropout
        active too), so this replaces staleness without changing the
        dropout bias; a deterministic-forward refresh (needs a
        dropout-off/BN-batch-stats module mode) is possible future
        work. Measured net effect on the UNet (one bottleneck
        Dropout): eval dice restored to train-mode level
        (tests/test_bn_refresh.py).

    Returns a new batch_stats tree. Raises ValueError on an empty
    ``batches``.
    """

    @jax.jit
    def raw_batch_stats(p, stats_in, x, key):
        _, mut = module.apply(
            {"params": p, "batch_stats": stats_in},
            x,
            training=True,
            rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        # s_b = (new - m*old)/(1-m): recovers THIS batch's raw mean/var
        # from the momentum update, exactly, for any anchor values.
        return jax.tree_util.tree_map(
            lambda n, o: (n.astype(jnp.float32) - momentum * o)
            / (1.0 - momentum),
            mut["batch_stats"],
            stats_in,
        )

    total = None
    count = 0
    for x in batches:
        s = raw_batch_stats(
            params, batch_stats, x, jax.random.fold_in(rng, count)
        )
        # accumulate (mean_b, var_b + mean_b^2) per BN
        term = _tree_bn_map(
            lambda d: {"mean": d["mean"], "var": d["var"] + d["mean"] ** 2},
            s,
        )
        total = (
            term
            if total is None
            else jax.tree_util.tree_map(jnp.add, total, term)
        )
        count += 1
    if total is None:
        raise ValueError("compute_precise_batch_stats needs >= 1 batch")

    avg = jax.tree_util.tree_map(lambda v: v / count, total)
    return _tree_bn_map(
        lambda d: {
            "mean": d["mean"],
            # law of total variance; clamp tiny negative f32 residue
            "var": jnp.maximum(d["var"] - d["mean"] ** 2, 0.0),
        },
        avg,
    )
