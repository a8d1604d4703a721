"""Character tokenizer over per-dataset symbol vocabularies.

Reference behavior: BOS '^' + cleaned text + EOS '~', mapped through a
symbol->id table built from the hparams character string
(reference: datasets/datasets.py:253-262, configs/hparams.py:260-264).
"""

from __future__ import annotations

from typing import List, Sequence

from ..configs.hparams import TextConfig
from .cleaners import english_cleaners


class CharTokenizer:
    def __init__(self, text_config: TextConfig):
        self.cfg = text_config
        self.symbols: List[str] = list(text_config.characters)
        self.symbol_to_id = {s: i for i, s in enumerate(self.symbols)}
        self.id_to_symbol = {i: s for i, s in enumerate(self.symbols)}
        self.pad_id = self.symbol_to_id[text_config.pad]

    @property
    def vocab_size(self) -> int:
        return len(self.symbols)

    def encode(self, cleaned: str) -> List[int]:
        """Wrap cleaned text in BOS/EOS and map to ids. Unknown symbols raise,
        matching the reference's direct dict lookup (datasets.py:261)."""
        text = self.cfg.bos + cleaned + self.cfg.eos
        return [self.symbol_to_id[s] for s in text]

    def encode_english(self, raw: str) -> List[int]:
        return self.encode(english_cleaners(raw))

    def decode(self, ids: Sequence[int], strip_specials: bool = False) -> str:
        s = "".join(self.id_to_symbol[int(i)] for i in ids)
        if strip_specials:
            for sp in (self.cfg.pad, self.cfg.bos, self.cfg.eos):
                s = s.replace(sp, "")
        return s
