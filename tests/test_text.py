"""Tokenizer parity tests (contract: ttts/gpt/voice_tokenizer.py)."""

import numpy as np

from ttts_tpu.text import VoiceBpeTokenizer, default_tokenizer, text_to_pinyin
from ttts_tpu.text.tokenizer import clean_text


class TestTokenizer:
    def test_vocab_artifact_loads(self):
        tok = default_tokenizer()
        assert tok.vocab_size == 255

    def test_specials(self):
        tok = default_tokenizer()
        # [STOP]=0, [UNK]=1, [SPACE]=2 (voice_tokenizer.py:86 training specials)
        assert tok.tokenizer.token_to_id("[STOP]") == 0
        assert tok.tokenizer.token_to_id("[UNK]") == 1
        assert tok.tokenizer.token_to_id("[SPACE]") == 2

    def test_encode_space_substitution(self):
        tok = default_tokenizer()
        ids = tok.encode("ni3 hao3")
        assert 2 in ids  # [SPACE] token present
        assert tok.decode(np.asarray(ids)) == "ni3 hao3"

    def test_roundtrip_pinyin_sentence(self):
        tok = default_tokenizer()
        s = "jin1 tian1 tian1 qi4 zhen1 hao3"
        assert tok.decode(tok.encode(s)) == s

    def test_clean_text(self):
        assert clean_text("a{b}c[d]e") == "a(b)c(d)e"
        assert clean_text("it`s") == "it's"
        assert clean_text("@") == ""


class TestPinyin:
    def test_ascii_passthrough_without_pypinyin(self):
        # works with or without pypinyin installed
        assert text_to_pinyin("hello world") in ("hello world", "hello world")


class TestRedaction:
    def test_parse_redactions(self):
        from ttts_tpu.text.alignment import parse_redactions

        clean, red = parse_redactions("hello [secret words] and [more] text")
        assert clean == "hello secret words and more text"
        assert red == ["secret words", "more"]

    def test_no_brackets_passthrough(self):
        from ttts_tpu.text.alignment import parse_redactions

        clean, red = parse_redactions("no brackets here")
        assert clean == "no brackets here" and red == []
