"""Baseline losses.

``triplets_loss``: KL-divergence triplet objective of the reference's
triplets baseline (code/utils/cluster/baselines/triplets.py:231-238):
  KL(softmax(pos) || softmax(orig)) - KL(softmax(neg) || softmax(orig)),
each KL reduced with torch's 'elementwise_mean' semantics (mean over ALL
elements, not per-sample) and xlogy handling of zero targets.

``doersch_loss`` / ``isola_loss``: the context-prediction (9-way position
CE) and adjacency-prediction (binary CE) objectives used by the
segmentation baselines (code/scripts/segmentation/baselines/doersch.py,
isola.py).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy


def _kl_div_elementwise_mean(target_probs, input_log_probs):
    """torch F.kl_div(input, target, reduction='elementwise_mean'):
    mean over all elements of target*(log(target) - input), 0 log 0 = 0."""
    pointwise = xlogy(target_probs, target_probs) \
        - target_probs * input_log_probs
    return jnp.mean(pointwise)


def triplets_loss(outs_orig, outs_pos, outs_neg):
    """(bn, k) logits each. Minimised."""
    orig = jax.nn.log_softmax(outs_orig, axis=1)
    pos = jax.nn.softmax(outs_pos, axis=1)
    neg = jax.nn.softmax(outs_neg, axis=1)
    return _kl_div_elementwise_mean(pos, orig) \
        - _kl_div_elementwise_mean(neg, orig)


def doersch_loss(position_logits, position_labels, mask_per_pred=None):
    """9-way patch-position cross-entropy (Doersch et al. context
    prediction; reference net10a_doersch head outputs 9 logits).

    With ``mask_per_pred`` (bn,) this is the reference's relevancy-masked
    loss (code/utils/segmentation/baselines/doersch_utils.py:48-70): a
    sample contributes iff at least one of its two patch centres lies in
    the relevancy mask, and the sum is normalised by the kept count."""
    import optax
    per_elem = optax.softmax_cross_entropy_with_integer_labels(
        position_logits, jnp.broadcast_to(position_labels,
                                          position_logits.shape[:1]))
    if mask_per_pred is None:
        return per_elem.mean()
    return _masked_mean(per_elem, mask_per_pred)


def isola_loss(adjacency_logit, is_adjacent, mask_per_pred=None):
    """Binary cross-entropy on the adjacency probability (Isola et al.;
    reference net10a_isola head outputs 1 sigmoid).

    With ``mask_per_pred`` this reproduces the reference's masked loss
    (code/utils/segmentation/baselines/isola_utils.py:12-80): per-sample
    -log p_t where p_t is the probability of the true class, samples whose
    p_t < machine-eps are zeroed out entirely (the reference clamps AND
    multiplies by an exclusion indicator), and the sum is divided by the
    number of mask-kept samples (eps-excluded ones still count there)."""
    import sys
    import optax
    pred = jax.nn.sigmoid(adjacency_logit.squeeze(-1))
    gt = jnp.broadcast_to(is_adjacent, pred.shape).astype(jnp.float32)
    if mask_per_pred is None:
        return optax.sigmoid_binary_cross_entropy(
            adjacency_logit.squeeze(-1), gt).mean()
    eps = sys.float_info.epsilon
    p_t = jnp.where(gt > 0.5, pred, 1.0 - pred)
    keep = (p_t >= eps).astype(jnp.float32)
    per_elem = -keep * jnp.log(jnp.maximum(p_t, eps))
    return _masked_mean(per_elem, mask_per_pred)


def _masked_mean(per_elem, mask):
    """sum(mask * x) / sum(mask), returning 0 for an all-irrelevant batch
    (the reference divides by the raw count and NaN-crashes there —
    doersch_utils.py:61-70; we keep training alive instead)."""
    m = mask.astype(jnp.float32)
    norm = m.sum()
    return jnp.where(norm > 0, (m * per_elem).sum()
                     / jnp.maximum(norm, 1.0), 0.0)
