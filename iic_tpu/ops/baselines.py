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


def doersch_loss(position_logits, position_labels):
    """9-way patch-position cross-entropy (Doersch et al. context
    prediction; reference net10a_doersch head outputs 9 logits)."""
    import optax
    return optax.softmax_cross_entropy_with_integer_labels(
        position_logits, position_labels).mean()


def isola_loss(adjacency_logit, is_adjacent):
    """Binary cross-entropy on the adjacency probability (Isola et al.;
    reference net10a_isola head outputs 1 sigmoid)."""
    import optax
    return optax.sigmoid_binary_cross_entropy(
        adjacency_logit.squeeze(-1), is_adjacent.astype(jnp.float32)).mean()
