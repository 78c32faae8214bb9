"""recordlinkage_spark — a from-scratch, PySpark-native near-duplicate
detection + clustering engine with the semantics of the reference
``recordlinkage`` toolkit (J535D165/recordlinkage), re-targeted at
web-scale text dedup (MinHash/LSH, SimHash, fingerprint substring passes).

Architecture (Spark-first, NOT a port):

    Index  (candidate-pair generation)   -> pair DataFrame (id_1, id_2 [, pass])
    Compare (per-pair feature vectors)   -> feature DataFrame (id_1, id_2, f_*)
    Classify (threshold / ECM / NB / ...)-> match DataFrame  (id_1, id_2, score, label)
    Cluster (connected components)       -> cluster DataFrame (id, cluster_id)

Every stage is a lazy DataFrame -> DataFrame transformation; Catalyst +
AQE pick the physical plan. Pair convention for dedup: ``id_1 > id_2``
(the reference's lower-triangle convention, recordlinkage/base.py:277-282).
"""

from recordlinkage_spark.config import EngineConfig, get_spark
from recordlinkage_spark.indexing import (
    Block,
    Full,
    Index,
    Random,
    SortedNeighbourhood,
)
from recordlinkage_spark.minhash import MinHashLSH
from recordlinkage_spark.simhash import SimHash
from recordlinkage_spark.suffix import (
    FingerprintSubstring,
    remove_duplicate_spans,
)
from recordlinkage_spark.comparing import Compare
from recordlinkage_spark.classifiers import (
    ECMClassifier,
    KMeansClassifier,
    LogisticRegressionClassifier,
    NaiveBayesClassifier,
    ThresholdClassifier,
)
from recordlinkage_spark.network import (
    ConnectedComponents,
    OneToManyLinking,
    OneToOneLinking,
)
from recordlinkage_spark import measures
from recordlinkage_spark.bloom import BloomFilter, build_bloom, dedup_against
from recordlinkage_spark.pipeline import DedupPipeline

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "get_spark",
    "Index",
    "Full",
    "Block",
    "SortedNeighbourhood",
    "Random",
    "MinHashLSH",
    "SimHash",
    "FingerprintSubstring",
    "remove_duplicate_spans",
    "Compare",
    "ThresholdClassifier",
    "LogisticRegressionClassifier",
    "NaiveBayesClassifier",
    "KMeansClassifier",
    "ECMClassifier",
    "OneToOneLinking",
    "OneToManyLinking",
    "ConnectedComponents",
    "measures",
    "DedupPipeline",
    "BloomFilter",
    "build_bloom",
    "dedup_against",
]
