"""Enumerations and global constants shared across the framework.

Capability parity with the reference's ``unirec/constants/`` package
(protocols.py:6-87, loss_funcs.py:6-16, global_variables.py:4-6), re-expressed
for a JAX codebase: everything here is plain data usable at trace time.
"""
from __future__ import annotations

import enum

EPS = 1e-8
# Score assigned to masked-out (e.g. already-interacted) items during
# full-catalog evaluation. Matches the reference evaluator's NINF constant
# (evaluator_abc.py:46).
NINF_SCORE = -9999.0


class EvalProtocol(str, enum.Enum):
    ONE_VS_ALL = "one_vs_all"
    ONE_VS_K = "one_vs_k"
    LABEL_AWARE = "label_aware"
    SESSION_AWARE = "session_aware"


class DataFormat(str, enum.Enum):
    """On-disk interaction file formats (reference protocols.py:12-52)."""

    T1 = "user-item"
    T1_1 = "user-item-max_len"
    T2 = "user-item-label"
    T2_1 = "user-item-label-session"
    T3 = "user-item-rating"
    T4 = "user-item_group-label_group"
    T5 = "user-item_seq"
    T5_1 = "user_item_seq"
    T6 = "user-item_seq-time_seq"
    T7 = "label-index_group-value_group"


class ColNames(str, enum.Enum):
    USERID = "user_id"
    ITEMID = "item_id"
    ITEMID_GROUP = "item_id_list"
    LABEL = "label"
    LABEL_GROUP = "label_list"
    USER_HISTORY = "item_seq"
    TIME_HISTORY = "time_seq"
    SESSION = "session_id"
    INDEX_GROUP = "index_list"
    VALUE_GROUP = "value_list"
    MAX_LEN = "max_len"


class DatasetType(str, enum.Enum):
    BaseDataset = "BaseDataset"
    SeqRecDataset = "SeqRecDataset"
    AERecDataset = "AERecDataset"
    RankDataset = "RankDataset"


class HistoryMaskMode(str, enum.Enum):
    UNORDER = "unorder"
    AUTOREGRESSIVE = "autoregressive"


class TaskType(str, enum.Enum):
    TRAIN = "train"
    TEST = "test"
    INFER = "infer"


class EdgeNormType(str, enum.Enum):
    NONE = "none"
    SQRT_DEGREE = "sqrt_degree"


class LossType(str, enum.Enum):
    BCE = "bce"
    BPR = "bpr"
    SOFTMAX = "softmax"
    CCL = "ccl"
    FULLSOFTMAX = "fullsoftmax"


class DistanceType(str, enum.Enum):
    DOT = "dot"
    COSINE = "cosine"
    MLP = "mlp"
