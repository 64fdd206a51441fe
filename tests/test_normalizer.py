"""English normalizer vs the reference implementation (VERDICT r3 item 6).

The oracle is the copy of the OpenAI Whisper normalizer bundled in
``transformers`` (transformers.models.whisper.english_normalizer) — the
exact rule set BASELINE's "WER within 0.1 abs" is defined under. Both
normalizers get the same spelling mapping so the comparison pins the hard
parts: the number state machine, contractions, symbol stripping.
"""

import numpy as np
import pytest

from whisper_burn_tpu.eval.english_normalizer import (
    DEFAULT_SPELLING_MAPPING,
    EnglishNumberNormalizer,
    EnglishTextNormalizer,
)

hf_norm = pytest.importorskip("transformers.models.whisper.english_normalizer")

TRICKY = [
    # contractions and titles
    "Mr. Brown and Mrs. Smith won't be going to St. Mary's",
    "I'm sure she'd been there, and she's got what we'd want",
    "Let's say y'all ain't gonna wanna go",
    "they're well aware it'll've been done",
    "Dr. Jones, Jr. met Capt. Kirk and Lt. Col. Sanders",
    # fillers / brackets
    "well, hmm, I think [laughter] it's (noise) fine, uh, really",
    "the <unk> token and [inaudible] part disappear",
    # numbers: cardinals
    "one hundred and fifty three people came",
    "two thousand and five was a good year",
    "she counted twenty one, twenty two, and twenty three",
    "a million dollars and seven hundred thousand euros",
    "nineteen eighty four by george orwell",
    "three point one four one five nine",
    "zero point five percent of one percent",
    "minus forty degrees is the same in both scales",
    "plus seven is positive seven",
    "double oh seven reporting, triple six",
    "one hundred and twenty three thousand four hundred and fifty six",
    "twelve hundred people",
    "five thousand five hundred and fifty five",
    # ordinals
    "the twenty first century and the third millennium",
    "her fifth birthday is on march second",
    "the hundredth time and the thousandth visitor",
    "twelfth night was his ninth play",
    "the eighty eighth key of the piano",
    # currency
    "one dollar and fifty cents",
    "two hundred pounds sterling",
    "fifty euros a night",
    "it costs $1,500.50 altogether",
    "ninety nine cents only",
    "two dollars and seven cents",
    # mixed digits/words
    "i have 3 cats and twenty2 dogs",
    "room 101 on the 2nd floor",
    "call 555 0123 now",
    "the year 2023 was the 1st of its kind",
    # percent
    "fifty percent of the time, seven per cent interest",
    "a one hundred percent guarantee",
    # halves
    "two and a half hours",
    "an hour and a half",
    "three and a half thousand",
    # plurals of numbers
    "she rolled two sixes and three nines",
    "it was in the nineteen nineties",
    "thousands of millions of stars",
    "the seventies and the eighties",
    # diacritics and symbols
    "café naïve résumé coöperate",
    "rock & roll at 100% volume",
    "emails like user@example.com survive-ish",
    "the œuvre of the søren æsthetic",
    # spellings
    "the colour of the neighbour's armour",
    "he apologised for the behaviour at the centre",
    "realise, organise, recognise",
    # punctuation / whitespace
    "wait...    what?!  no -- way.",
    "a.b.c. d.e.f.",
    "10.5 meters, 10. 5 meters, 10 .5",
    "'quoted' and \"double quoted\" text",
    # apostrophe spacing
    "it 's a strange ' spacing case",
    "the dog 's bone and the cats ' toys",
]


@pytest.fixture(scope="module")
def oracles():
    ours = EnglishTextNormalizer(DEFAULT_SPELLING_MAPPING)
    theirs = hf_norm.EnglishTextNormalizer(DEFAULT_SPELLING_MAPPING)
    return ours, theirs


@pytest.mark.parametrize("text", TRICKY)
def test_matches_reference_on_tricky_pairs(text, oracles):
    ours, theirs = oracles
    assert ours(text) == theirs(text)


def test_number_normalizer_matches_on_generated_phrases():
    """Randomized spelled-number phrases: both state machines agree."""
    ours = EnglishNumberNormalizer()
    theirs = hf_norm.EnglishNumberNormalizer()
    ones = [
        "one", "two", "three", "four", "five", "six", "seven", "eight",
        "nine", "ten", "eleven", "twelve", "thirteen", "nineteen",
    ]
    tens = ["twenty", "thirty", "forty", "fifty", "ninety"]
    mults = ["hundred", "thousand", "million", "billion"]
    glue = ["and", "point", "oh", "dollars", "cents", "percent", "minus"]
    vocab = ones + tens + mults + glue + ["cat", "the", "7", "3.5"]
    rng = np.random.default_rng(0)
    for _ in range(400):
        n = int(rng.integers(1, 9))
        phrase = " ".join(rng.choice(vocab, size=n))
        assert ours(phrase) == theirs(phrase), phrase


def test_full_normalizer_matches_on_generated_sentences():
    ours, theirs = (
        EnglishTextNormalizer(DEFAULT_SPELLING_MAPPING),
        hf_norm.EnglishTextNormalizer(DEFAULT_SPELLING_MAPPING),
    )
    words = [
        "the", "quick", "colour", "won't", "it's", "twenty", "one",
        "hundred", "and", "dollars", "Mr.", "first", "7", "point", "five",
        "uh", "[noise]", "(ok)", "don't", "we'll", "half", "a",
    ]
    rng = np.random.default_rng(1)
    for _ in range(300):
        n = int(rng.integers(1, 12))
        phrase = " ".join(rng.choice(words, size=n))
        assert ours(phrase) == theirs(phrase), phrase


def test_wer_uses_english_normalizer():
    """eval.wer.normalize_text applies the full English rules by default."""
    from whisper_burn_tpu.eval.wer import wer

    assert (
        wer("Mr. Brown owes one hundred and fifty dollars", "mister brown owes $150")
        == 0.0
    )
