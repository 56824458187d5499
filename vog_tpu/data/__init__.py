from vog_tpu.data.dataset import AnetSRLDataset, FeatureStore, get_vocab
from vog_tpu.data.loader import BatchIterator, DataWrap, collate, get_data
from vog_tpu.data.vocab import ROLE2ID, ROLE_LIST, Vocab, role_to_id

__all__ = [
    "AnetSRLDataset",
    "FeatureStore",
    "get_vocab",
    "BatchIterator",
    "DataWrap",
    "collate",
    "get_data",
    "ROLE2ID",
    "ROLE_LIST",
    "Vocab",
    "role_to_id",
]
