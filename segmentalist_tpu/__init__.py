"""segmentalist_tpu: TPU-native unsupervised acoustic word segmentation.

A from-scratch JAX/XLA/Pallas re-design of kamperh/segmentalist: blocked Gibbs
sampling over acoustic word embeddings with unigram / bigram language models,
plus the segmental k-means variant.  See SURVEY.md at the repo root for the
reference layer map this framework mirrors.

Public API (reference parity):
    FBGMM, KMeans                         -- clustering models
    NIW, FixedVarPrior                    -- priors
    UnigramAcousticWordseg                -- unigram segmenter driver
    BigramAcousticWordseg                 -- bigram segmenter driver
    SegmentalKMeansWordseg                -- segmental k-means driver
    Utterances                            -- corpus / segmentation state
"""

from .priors import NIW, FixedVarPrior  # noqa: F401
from .models.fbgmm import FBGMM  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import segmentalist_tpu` light.
    if name == "KMeans":
        from .models.kmeans import KMeans
        return KMeans
    if name == "Utterances":
        from .corpus import Utterances
        return Utterances
    if name == "UnigramAcousticWordseg":
        from .segmenters.unigram import UnigramAcousticWordseg
        return UnigramAcousticWordseg
    if name == "BigramAcousticWordseg":
        from .segmenters.bigram import BigramAcousticWordseg
        return BigramAcousticWordseg
    if name == "SegmentalKMeansWordseg":
        from .segmenters.kmeans_seg import SegmentalKMeansWordseg
        return SegmentalKMeansWordseg
    if name == "BigramSmoothLM":
        from .models.bigram_lm import BigramSmoothLM
        return BigramSmoothLM
    if name == "wishart":
        import importlib

        return importlib.import_module(".wishart", __name__)
    raise AttributeError(name)
