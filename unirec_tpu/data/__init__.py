from unirec_tpu.data.datasets import (  # noqa: F401
    AERecDataset,
    BaseDataset,
    InferDataset,
    RankDataset,
    SeqRecDataset,
)
from unirec_tpu.data.history import UserHistory  # noqa: F401
from unirec_tpu.data.pipeline import Batcher, make_eval_batcher, make_train_batcher  # noqa: F401
from unirec_tpu.data.sampler import AliasTable, NegativeSampler  # noqa: F401


def construct_item_popularity(history: UserHistory, n_items: int):
    """Item interaction counts from user histories (reference main.py:235-245).
    Item 0 is the padding placeholder and gets popularity 0."""
    import numpy as np

    mask = (np.arange(history.capacity)[None, :] < history.lengths[:, None])
    items = history.items[mask]
    res = np.bincount(items, minlength=n_items)[:n_items].astype(np.int32)
    res[0] = 0
    return res
