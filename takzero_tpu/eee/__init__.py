"""EEE (epistemic-uncertainty exploration experiments) harnesses.

TPU-native ports of the reference's offline experiment binaries
(reference eee/src/{rnd,generalization,ensemble,seen_ratio,utils}.rs):
standalone studies of how each local-novelty estimator behaves on
in-distribution (replay), random, and impossible (channel-permuted)
positions as training progresses.
"""

from .harness import (
    impossible_permutation,
    random_plane_batch,
    reference_batches,
    replay_positions,
)
