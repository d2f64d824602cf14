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

What it does: recompute every BatchNorm's running statistics as EXACT
population statistics of the training data under a given set of weights
(the "precise BN" technique). One pass over the data: each batch's raw
statistics are recovered from the module's momentum-updated mutable
output anchored at ZERO (``new_ra = (1 - m) * s_b`` exactly, so
``s_b = new_ra / (1 - m)`` — one multiply and one divide of rounding,
no catastrophic-cancellation amplification; r4 anchored at the current
running stats, which amplified f32 rounding ~100x), then aggregated
across equal-size batches with the law of total variance
(``mean = E_b[mean_b]``, ``var = E_b[var_b + mean_b^2] - mean^2``).

Used in two places by the training driver (`training/training.py`):
finalizing saved checkpoints (``bn_precise_stats``) and refreshing the
statistics behind each epoch's validation metrics so best-checkpoint
selection and early stopping see real checkpoint quality
(``bn_precise_val`` — r4 measured the rolling-stats val_dice reading
0.724 for a model whose true eval dice was 0.9999).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

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


class BNRefresher:
    """Reusable precise-BN statistics computer.

    Holds ONE jitted per-batch extraction function, so calling it every
    epoch (the ``bn_precise_val`` path) compiles once instead of
    re-tracing per call — a fresh ``@jax.jit`` closure per epoch would
    cost a full remote recompile (~30 s on the tunnel) each time.

    Args:
      module: the training compute module (``UNetModule``,
        ``S2DTrainForward``, ``DeepLabV3PlusModule`` — anything honoring
        the ``apply(variables, x, training=True, rngs={"dropout"},
        mutable=["batch_stats"])`` contract with the shared stats tree).
      momentum: the modules' BatchNorm momentum (recovery algebra input).
      deterministic: collect statistics under a dropout-OFF forward with
        BatchNorm still in batch-statistics mode (the modules'
        ``stats_mode=True``). The default (False) matches what both the
        rolling statistics and Keras's `fit` collect — a dropout-ACTIVE
        forward, whose post-dropout variances are biased high relative
        to the eval-mode distribution (means stay unbiased under
        inverted dropout). Measured on the synthetic task (r5, PLAN.md):
        the two refreshes land within ~1e-3 eval dice of each other —
        the bias is real but does not move quality on this
        architecture's single bottleneck Dropout, so the
        Keras-distribution-matching default stands.
    """

    def __init__(
        self,
        module,
        momentum: float = BN_MOMENTUM,
        deterministic: bool = False,
    ):
        self.deterministic = bool(deterministic)
        self._module = module
        self._momentum = momentum
        self._raw = None  # built on first call (needs the tree's shapes)

    def _build(self, batch_stats):
        # The anchor tree is all zeros and its SHAPES are fixed per
        # module, so it is a captured constant (a few KB of BN channel
        # vectors), not a traced argument — passing the caller's stats
        # tree as a runtime operand would force a pointless
        # host-fetch + re-upload of it on every refresh (it only ever
        # got zeros_like'd; its values never enter the computation).
        zeros = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype),
            jax.device_get(batch_stats),
        )
        module, momentum, deterministic = (
            self._module, self._momentum, self.deterministic
        )

        @jax.jit
        def _raw_batch_stats(p, x, key):
            # Anchor the momentum recurrence at zero: the mutable output
            # is then (1 - m) * s_b up to one rounding, and recovery is
            # a single division. Training-mode BN *outputs* never read
            # the running values (they normalize with the batch
            # statistics), so zeroing the anchor cannot change the
            # forward computation.
            if deterministic:
                _, mut = module.apply(
                    {"params": p, "batch_stats": zeros},
                    x,
                    training=False,
                    stats_mode=True,
                    mutable=["batch_stats"],
                )
            else:
                _, mut = module.apply(
                    {"params": p, "batch_stats": zeros},
                    x,
                    training=True,
                    rngs={"dropout": key},
                    mutable=["batch_stats"],
                )
            return jax.tree_util.tree_map(
                lambda n: n.astype(jnp.float32) / (1.0 - momentum),
                mut["batch_stats"],
            )

        self._raw = _raw_batch_stats

    def __call__(
        self,
        params,
        batch_stats,
        batches,
        rng=None,
        cross_process: bool = False,
    ):
        """Exact population BN statistics of ``batches`` under ``params``.

        Args:
          params / batch_stats: the weights and any same-shaped stats
            tree. The stats are used ONCE, at the refresher's first
            call, as the shape/dtype template for the zero anchor baked
            into the extraction jit — values never enter the
            computation, and later calls ignore the argument entirely
            (one BNRefresher serves one module's tree structure).
          batches: iterable of equal-size input batches (already
            preprocessed, i.e. what the module's forward consumes).
          rng: dropout key (ignored with ``deterministic=True``).
          cross_process: in multi-process runs, aggregate the per-batch
            accumulators across ALL processes (``process_allgather`` of
            the (sum, count) pair), so the returned statistics cover
            every process's data shard — the law-of-total-variance
            algebra stays exact because every shard's batches are the
            same size. Every participating process must call with the
            same number of LOCAL batches (the training driver trims
            shards to equal size for exactly this reason); the returned
            tree is identical on all processes.

        Returns a new batch_stats tree. Raises ValueError on an empty
        ``batches``.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self._raw is None:
            self._build(batch_stats)
        total = None
        count = 0
        for x in batches:
            s = self._raw(params, x, jax.random.fold_in(rng, count))
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
            raise ValueError("BNRefresher needs >= 1 batch")

        if cross_process and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # Host-level collective on the (host-fetched) accumulators:
            # stacked with a leading process axis, then summed. Count
            # rides along so unequal per-process batch counts fail loud
            # in the averaged result rather than silently reweighting.
            gathered = multihost_utils.process_allgather(
                (jax.device_get(total), np.int64(count))
            )
            total = jax.tree_util.tree_map(
                lambda stacked: np.sum(np.asarray(stacked), axis=0),
                gathered[0],
            )
            count = int(np.sum(gathered[1]))

        avg = jax.tree_util.tree_map(lambda v: v / count, total)
        return _tree_bn_map(
            lambda d: {
                "mean": d["mean"],
                # law of total variance; clamp tiny negative f32 residue
                "var": jnp.maximum(d["var"] - d["mean"] ** 2, 0.0),
            },
            avg,
        )


def compute_precise_batch_stats(
    module,
    params,
    batch_stats,
    batches,
    rng,
    momentum: float = BN_MOMENTUM,
    deterministic: bool = False,
    cross_process: bool = False,
):
    """One-shot convenience wrapper over :class:`BNRefresher`.

    For repeated refreshes (per-epoch validation), build one
    :class:`BNRefresher` and reuse it — this wrapper creates a fresh
    jitted extraction function every call.
    """
    refresher = BNRefresher(
        module, momentum=momentum, deterministic=deterministic
    )
    return refresher(
        params, batch_stats, batches, rng=rng, cross_process=cross_process
    )
