"""Moses/nkf-role text normalization (data/text_norm.py).

Behavioral spec: Moses tokenizer.perl / detokenizer.perl and `nkf -w -Z`
as used by the reference's MT/ST recipe preprocessing (SURVEY.md §2.6,
`tools/Makefile:131,160`).
"""

from espnet_tpu.data.text_norm import (
    moses_detokenize,
    moses_tokenize,
    normalize_charset,
)


def test_punct_split_and_number_protection():
    assert moses_tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert moses_tokenize("It costs 1,234.50 dollars.") == [
        "It", "costs", "1,234.50", "dollars", "."]


def test_abbreviations_kept():
    assert moses_tokenize("Dr. Smith met Mr. Jones.") == [
        "Dr.", "Smith", "met", "Mr.", "Jones", "."]
    assert moses_tokenize("born in the U.S. in 1990") == [
        "born", "in", "the", "U.S.", "in", "1990"]


def test_english_apostrophe():
    assert moses_tokenize("don't stop") == ["don", "'t", "stop"]
    assert moses_tokenize("the cat's hat") == ["the", "cat", "'s", "hat"]


def test_french_apostrophe():
    assert moses_tokenize("l'eau", lang="fr") == ["l'", "eau"]


def test_brackets_and_symbols():
    assert moses_tokenize("(a b) #tag") == ["(", "a", "b", ")", "#", "tag"]


def test_detokenize_roundtrip():
    s = "Hello, world! It costs 1,234.50 dollars."
    assert moses_detokenize(moses_tokenize(s)) == s


def test_detokenize_contractions_and_quotes():
    assert moses_detokenize(["don", "'t", "stop"]) == "don't stop"
    assert moses_detokenize(['"', "hi", ",", "there", '"']) == '"hi, there"'


def test_nkf_charset_normalization():
    # full-width Latin + digits fold to ASCII (nkf -Z role)
    assert normalize_charset("ＡＢＣ１２３") == "ABC123"
    # half-width katakana -> full-width (NFKC)
    assert normalize_charset("ｶﾀｶﾅ") == "カタカナ"
    # NFC mode keeps compatibility forms
    assert normalize_charset("ＡＢ", to_ascii=False) == "ＡＢ"


def test_cli_cleaner(tmp_path):
    from espnet_tpu.bin.tokenize_text import main

    src = tmp_path / "text"
    src.write_text("utt1 Don't, stop!\n", encoding="utf-8")
    out = tmp_path / "out"
    main(["--input", str(src), "--output", str(out), "--token_type", "word",
          "--field", "2-", "--cleaner", "moses"])
    assert out.read_text(encoding="utf-8").split() == [
        "utt1", "Don", "'t", ",", "stop", "!"]
