from .corpus import CORPORA, DataBakerCorpus, LJSpeechCorpus, TextMelCorpus
from .loader import Batch, BucketedLoader, pad_to_multiple
from .records import (
    RecordShardReader,
    RecordShardWriter,
    RecordWriter,
    Utterance,
    list_shards,
)

__all__ = [
    "CORPORA",
    "DataBakerCorpus",
    "LJSpeechCorpus",
    "TextMelCorpus",
    "Batch",
    "BucketedLoader",
    "pad_to_multiple",
    "RecordShardReader",
    "RecordShardWriter",
    "RecordWriter",
    "Utterance",
    "list_shards",
]
