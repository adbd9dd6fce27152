"""Host-side text frontend: cleaning, pinyin conversion, BPE tokenization."""

from ttts_tpu.text.tokenizer import VoiceBpeTokenizer, default_tokenizer  # noqa: F401
from ttts_tpu.text.pinyin import text_to_pinyin, HAVE_PYPINYIN  # noqa: F401
