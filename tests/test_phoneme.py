"""Phoneme tokenizer + text cleaners (reference
`espnet2/text/phoneme_tokenizer.py` / `cleaner.py`)."""

from espnet_tpu.data.phoneme import PhonemeTokenizer, TextCleaner
from espnet_tpu.data.tokenizer import build_tokenizer


def test_cleaner_tacotron_style():
    c = TextCleaner("tacotron")
    assert c("(Hello-World);   &  jr. & dr.") == \
        "HELLO WORLD, AND JUNIOR AND DOCTOR"


def test_cleaner_basic():
    c = TextCleaner("basic")
    assert c("  Foo,   BAR!! ") == "foo bar"


def test_phoneme_roundtrip_lexicon_words():
    t = PhonemeTokenizer()
    toks = t.text2tokens("ichi ni san")
    assert toks == ["IY", "CH", "IY", "<space>", "N", "IY", "<space>",
                    "S", "AA", "N"]
    assert t.tokens2text(toks) == "ichi ni san"


def test_phoneme_oov_fallback_deterministic():
    t = PhonemeTokenizer()
    assert t.g2p("abc") == ["AA", "B", "K"]
    assert t.text2tokens("abc abc") == t.text2tokens("abc abc")


def test_phoneme_with_lexicon_file(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("hello HH AH L OW\nworld W ER L D\n")
    t = PhonemeTokenizer(lexicon=str(lex), cleaner="basic")
    toks = t.text2tokens("Hello, WORLD!")
    assert toks == ["HH", "AH", "L", "OW", "<space>", "W", "ER", "L", "D"]
    assert t.tokens2text(toks) == "hello world"


def test_build_tokenizer_phn():
    t = build_tokenizer("phn")
    assert t.text2tokens("go")[0] == "G"
