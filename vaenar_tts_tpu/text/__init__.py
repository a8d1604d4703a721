from .cleaners import (
    basic_cleaners,
    convert_to_ascii,
    english_cleaners,
    transliteration_cleaners,
)
from .numbers import normalize_numbers, number_to_words, ordinal_words
from .pinyin import parse_cn_prosody_label, text_to_pinyin
from .tokenizer import CharTokenizer

__all__ = [
    "basic_cleaners",
    "convert_to_ascii",
    "english_cleaners",
    "transliteration_cleaners",
    "normalize_numbers",
    "number_to_words",
    "ordinal_words",
    "parse_cn_prosody_label",
    "text_to_pinyin",
    "CharTokenizer",
]
