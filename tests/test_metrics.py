"""WER/CER parity with known values."""

from huggingface_asr_tpu.utils.metrics import cer, edit_distance, wer


def test_edit_distance_basic():
    assert edit_distance("abc", "abc") == (0, 0, 0)
    assert edit_distance("abc", "axc") == (1, 0, 0)
    assert edit_distance("abc", "ac") == (0, 1, 0)
    assert edit_distance("abc", "abxc") == (0, 0, 1)
    assert edit_distance("kitten", "sitting") == (2, 0, 1)


def test_wer_known_values():
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    assert wer(["the cat sat"], ["the cat"]) == 1 / 3
    assert wer(["the cat sat"], ["the bat sat down"]) == 2 / 3
    # corpus-level: weighted by reference lengths
    assert wer(["a b", "c d e f"], ["a x", "c d e f"]) == 1 / 6


def test_wer_detailed():
    d = wer(["the cat sat"], ["the bat sat down"], detailed=True)
    assert d["substitutions"] == 1
    assert d["insertions"] == 1
    assert d["deletions"] == 0
    assert d["hits"] == 2


def test_cer():
    assert cer(["abc"], ["abc"]) == 0.0
    assert cer(["abcd"], ["abxd"]) == 0.25
    # whitespace normalized before character comparison
    assert cer(["a  b"], ["a b"]) == 0.0


def test_normalizer_bundled_spelling_map_default():
    """British→American spelling normalization works out of the box (the
    reference embeds this map in english_normalizer.py; we bundle it as JSON
    and apply it by default)."""
    from huggingface_asr_tpu.utils.normalizer import EnglishNormalizer

    n = EnglishNormalizer()
    assert n("he accessorised his colourful armour") == (
        "he accessorized his colorful armor"
    )
    # opt-out still works
    n_empty = EnglishNormalizer(spelling_map={})
    assert "colourful" in n_empty("a colourful day")
