"""Bigram-tied finite Bayesian GMM.

Re-design of the reference ``BigramFBGMM`` (``bigram_fbgmm.py:19-100``): an
FBGMM variant with no Dirichlet ``alpha`` and no own ``gibbs_sample`` -- the
mixture-weight terms come from the bigram language model and assignment
sampling lives in the bigram segmentation driver
(``bigram_acoustic_wordseg.py:332-384``).

The reference threads the LM into the fixed-variance component store so that
component compaction also relabels LM count rows
(``gaussian_components_fixedvar.py:204-221``); the masked-slot design here
never relabels, so the tie is unnecessary and the ``lm`` argument is accepted
only for signature parity.
"""

from __future__ import annotations

from .fbgmm import FBGMM


class BigramFBGMM(FBGMM):
    def __init__(self, X, prior, K, assignments="rand",
                 covariance_type="fixed", lms=1.0, lm=None, key=None):
        # alpha is unused by the bigram model (weights come from the LM); the
        # value 0 makes accidental use of the Dirichlet path conspicuous.
        super().__init__(X, prior, alpha=0.0, K=K, assignments=assignments,
                         covariance_type=covariance_type, lms=lms, key=key)
        self.lm = lm

    def gibbs_sample(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError(
            "BigramFBGMM has no own Gibbs sampler; assignment sampling is "
            "driven by BigramAcousticWordseg (reference bigram_fbgmm.py has "
            "no gibbs_sample either)."
        )
