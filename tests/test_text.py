"""Text frontend tests: cleaners, number expansion, tokenizer, pinyin parser.

Fixture strings mirror the behaviors of reference texts/texts.py and
datasets/datasets.py:269-341.
"""

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.text import (
    CharTokenizer,
    english_cleaners,
    normalize_numbers,
    number_to_words,
    ordinal_words,
    parse_cn_prosody_label,
)


class TestNumbers:
    def test_cardinals(self):
        assert number_to_words(0) == "zero"
        assert number_to_words(7) == "seven"
        assert number_to_words(13) == "thirteen"
        assert number_to_words(21) == "twenty-one"
        assert number_to_words(100, andword="") == "one hundred"
        assert number_to_words(101, andword="") == "one hundred one"
        assert number_to_words(101) == "one hundred and one"
        assert number_to_words(1234, andword="") == (
            "one thousand two hundred thirty-four")
        assert number_to_words(1000000, andword="") == "one million"
        assert number_to_words(3004000, andword="") == "three million four thousand"

    def test_ordinals(self):
        assert ordinal_words(1) == "first"
        assert ordinal_words(2) == "second"
        assert ordinal_words(3) == "third"
        assert ordinal_words(4) == "fourth"
        assert ordinal_words(12) == "twelfth"
        assert ordinal_words(20) == "twentieth"
        assert ordinal_words(23) == "twenty-third"
        # inflect default andword: the reference emits the "and" in ordinals
        assert ordinal_words(101) == "one hundred and first"
        assert ordinal_words(123) == "one hundred and twenty-third"

    def test_years(self):
        assert normalize_numbers("in 1906") == "in nineteen oh six"
        assert normalize_numbers("in 2021") == "in twenty twenty-one"
        assert normalize_numbers("in 2000") == "in two thousand"
        assert normalize_numbers("in 2005") == "in two thousand five"
        assert normalize_numbers("in 1800") == "in eighteen hundred"
        # outside the year range: plain cardinal
        assert normalize_numbers("3000 men") == "three thousand men"

    def test_currency(self):
        # digits from the currency pass are themselves expanded by the
        # later number pass, as in the reference pipeline (texts.py:135-142)
        assert normalize_numbers("$1.50") == "one dollar, fifty cents"
        assert normalize_numbers("$5") == "five dollars"
        assert normalize_numbers("$0.25") == "twenty-five cents"
        assert normalize_numbers("£20") == "twenty pounds"

    def test_decimals_and_commas(self):
        # comma-stripped 1234 lands in the 1001..2999 year-style branch,
        # exactly as the reference's inflect(group=2) call renders it
        assert normalize_numbers("1,234 things") == "twelve thirty-four things"
        assert normalize_numbers("5,000 men") == "five thousand men"
        assert normalize_numbers("3.14") == "three point fourteen"

    def test_ordinal_suffix_in_text(self):
        assert normalize_numbers("the 2nd time") == "the second time"
        assert normalize_numbers("the 31st of May") == "the thirty-first of May"


class TestCleaners:
    def test_english_pipeline(self):
        assert english_cleaners("Dr. Smith lives at No 10.") == (
            "doctor smith lives at no ten.")
        assert english_cleaners("Mr.  Jones   said") == "mister jones said"
        assert english_cleaners("CAFÉ   au lait") == "cafe au lait"
        assert english_cleaners("naïve résumé") == "naive resume"

    def test_currency_sentence(self):
        assert english_cleaners("It costs $1.50 today") == (
            "it costs one dollar, fifty cents today")

    def test_unicode_punctuation(self):
        assert english_cleaners("“quoted” — dash") == '"quoted" - dash'


class TestTokenizer:
    def test_roundtrip_lj(self):
        tok = CharTokenizer(get_config("ljspeech").text)
        assert tok.vocab_size == 43
        ids = tok.encode("hello world!")
        assert ids[0] == tok.symbol_to_id["^"]
        assert ids[-1] == tok.symbol_to_id["~"]
        assert tok.decode(ids, strip_specials=True) == "hello world!"

    def test_databaker_vocab(self):
        tok = CharTokenizer(get_config("databaker").text)
        assert tok.vocab_size == 39
        ids = tok.encode("ma1-ma1 hao3.")
        assert tok.decode(ids, strip_specials=True) == "ma1-ma1 hao3."

    def test_pad_is_zero(self):
        tok = CharTokenizer(get_config("ljspeech").text)
        assert tok.pad_id == 0


class TestPinyinParser:
    def test_prosody_parse(self):
        text = "100001 妈妈#1当时#1表示#3，儿子#1开心得#2像花儿#1一样#4。"
        py = ("ma1 ma1 dang1 shi2 biao3 shi4 er2 zi5 kai1 xin1 de5 "
              "xiang4 huar1 yi2 yang4")
        out = parse_cn_prosody_label(text, py)
        assert out == ("ma1-ma1 dang1-shi2 biao3-shi4, er2-zi5 "
                       "kai1-xin1-de5 xiang4-huar1 yi2-yang4.")

    def test_empty(self):
        assert parse_cn_prosody_label("", "") is None

    def test_erhua_merge(self):
        # 花儿 -> huar1: the 儿 char consumes no extra pinyin syllable
        text = "000002 花儿#4。"
        out = parse_cn_prosody_label(text, "huar1")
        assert out == "huar1."


def test_free_text_pinyin_requires_pypinyin():
    """Free-text Mandarin g2p needs pypinyin (absent here); the error must
    say so and note that corpus preprocessing does not need it."""
    import pytest as _pytest
    from vaenar_tts_tpu.text import text_to_pinyin
    with _pytest.raises(ImportError, match="pypinyin"):
        text_to_pinyin("你好")
