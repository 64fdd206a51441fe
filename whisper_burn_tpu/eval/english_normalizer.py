"""English text normalizer for WER evaluation (VERDICT r3 item 6).

A from-scratch, behavior-compatible port of the OpenAI Whisper English
normalizer (the rules BASELINE's "WER within 0.1 abs" is defined under —
the simplified casefold+strip normalizer can move WER by more than that on
its own). Three stages, mirroring the published rule set:

* :class:`EnglishNumberNormalizer` — spelled-out numbers to digits
  ("one hundred and fifty" -> "150", "twenty-first" -> "21st",
  "one dollar fifty" / "a hundred fifty dollars" -> "$...", "point five"
  -> ".5", "double oh seven" -> "007");
* :class:`EnglishSpellingNormalizer` — British -> American spellings
  (curated mapping; the upstream 1,700-entry JSON is model-repo data not
  available offline, so this ships the high-frequency subset);
* :class:`EnglishTextNormalizer` — lowercase, bracket/parenthetical and
  filler-word removal, contraction expansion, symbol/diacritic stripping,
  then the two stages above.

Equivalence with the reference implementation is pinned by
``tests/test_normalizer.py`` against the copy bundled in ``transformers``
(`transformers.models.whisper.english_normalizer`) on a fixture of tricky
pairs plus generated number phrases.
"""

from __future__ import annotations

import re
import unicodedata
from fractions import Fraction


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Replace markers/symbols/punctuation with a space, drop diacritics."""

    def repl(c: str) -> str:
        if c in keep:
            return c
        if c in ADDITIONAL_DIACRITICS:
            return ADDITIONAL_DIACRITICS[c]
        cat = unicodedata.category(c)
        if cat == "Mn":
            return ""
        if cat[0] in "MSP":
            return " "
        return c

    return "".join(repl(c) for c in unicodedata.normalize("NFKD", s))


def remove_symbols(s: str) -> str:
    """Replace markers/symbols/punctuation with a space, keep diacritics."""
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


ADDITIONAL_DIACRITICS = {
    "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th", "ł": "l", "Ł": "L",
}


class EnglishNumberNormalizer:
    """Convert spelled-out English numbers (with currency/ordinal/decimal
    forms) into arabic numerals, keeping ambiguous "one"/"ones" as words."""

    def __init__(self) -> None:
        super().__init__()

        self.zeros = {"o", "oh", "zero"}
        self.ones = {
            name: i
            for i, name in enumerate(
                [
                    "one", "two", "three", "four", "five", "six", "seven",
                    "eight", "nine", "ten", "eleven", "twelve", "thirteen",
                    "fourteen", "fifteen", "sixteen", "seventeen",
                    "eighteen", "nineteen",
                ],
                start=1,
            )
        }
        self.ones_plural = {
            "sixes" if name == "six" else name + "s": (value, "s")
            for name, value in self.ones.items()
        }
        self.ones_ordinal = {
            "zeroth": (0, "th"),
            "first": (1, "st"),
            "second": (2, "nd"),
            "third": (3, "rd"),
            "fifth": (5, "th"),
            "twelfth": (12, "th"),
            **{
                name + ("h" if name.endswith("t") else "th"): (value, "th")
                for name, value in self.ones.items()
                if value > 3 and value != 5 and value != 12
            },
        }
        self.ones_suffixed = {**self.ones_plural, **self.ones_ordinal}

        self.tens = {
            "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
            "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
        }
        self.tens_plural = {
            name.replace("y", "ies"): (value, "s") for name, value in self.tens.items()
        }
        self.tens_ordinal = {
            name.replace("y", "ieth"): (value, "th")
            for name, value in self.tens.items()
        }
        self.tens_suffixed = {**self.tens_plural, **self.tens_ordinal}

        self.multipliers = {
            "hundred": 100,
            "thousand": 1_000,
            "million": 1_000_000,
            "billion": 1_000_000_000,
            "trillion": 1_000_000_000_000,
            "quadrillion": 1_000_000_000_000_000,
            "quintillion": 1_000_000_000_000_000_000,
            "sextillion": 1_000_000_000_000_000_000_000,
            "septillion": 1_000_000_000_000_000_000_000_000,
            "octillion": 1_000_000_000_000_000_000_000_000_000,
            "nonillion": 1_000_000_000_000_000_000_000_000_000_000,
            "decillion": 1_000_000_000_000_000_000_000_000_000_000_000,
        }
        self.multipliers_plural = {
            name + "s": (value, "s") for name, value in self.multipliers.items()
        }
        self.multipliers_ordinal = {
            name + "th": (value, "th") for name, value in self.multipliers.items()
        }
        self.multipliers_suffixed = {
            **self.multipliers_plural,
            **self.multipliers_ordinal,
        }
        self.decimals = {*self.ones, *self.tens, *self.zeros}

        self.preceding_prefixers = {
            "minus": "-", "negative": "-", "plus": "+", "positive": "+",
        }
        self.following_prefixers = {
            "pound": "£", "pounds": "£", "euro": "€", "euros": "€",
            "dollar": "$", "dollars": "$", "cent": "¢", "cents": "¢",
        }
        self.prefixes = set(self.preceding_prefixers.values()) | set(
            self.following_prefixers.values()
        )
        self.suffixers = {
            "per": {"cent": "%"},
            "percent": "%",
        }
        self.specials = {"and", "double", "triple", "point"}

        self.words = {
            key
            for mapping in [
                self.zeros, self.ones, self.ones_suffixed, self.tens,
                self.tens_suffixed, self.multipliers,
                self.multipliers_suffixed, self.preceding_prefixers,
                self.following_prefixers, self.suffixers, self.specials,
            ]
            for key in mapping
        }
        self.literal_words = {"one", "ones"}

    def process_words(self, words: list[str]):
        prefix: str | None = None
        value: str | int | None = None
        skip = False

        def to_fraction(s: str) -> Fraction | None:
            try:
                return Fraction(s)
            except ValueError:
                return None

        def output(result: str | int):
            nonlocal prefix, value
            result = str(result)
            if prefix is not None:
                result = prefix + result
            value = None
            prefix = None
            return result

        if len(words) == 0:
            return

        for i, current in enumerate(words):
            prev = words[i - 1] if i != 0 else None
            next_w = words[i + 1] if i != len(words) - 1 else None
            if skip:
                skip = False
                continue

            next_is_numeric = next_w is not None and re.match(r"^\d+(\.\d+)?$", next_w)
            has_prefix = current[0] in self.prefixes
            current_without_prefix = current[1:] if has_prefix else current
            if re.match(r"^\d+(\.\d+)?$", current_without_prefix):
                # arabic numbers (potentially with signs and fractions)
                f = to_fraction(current_without_prefix)
                if f is None:
                    raise ValueError("Converting the fraction failed")
                if value is not None:
                    if isinstance(value, str) and value.endswith("."):
                        # concatenate decimals / ip-address-like strings
                        value = str(value) + str(current)
                        continue
                    else:
                        yield output(value)
                prefix = current[0] if has_prefix else prefix
                if f.denominator == 1:
                    value = f.numerator  # int
                else:
                    value = current_without_prefix
            elif current not in self.words:
                # non-numeric words
                if value is not None:
                    yield output(value)
                yield output(current)
            elif current in self.zeros:
                value = str(value or "") + "0"
            elif current in self.ones:
                ones = self.ones[current]
                if value is None:
                    value = ones
                elif isinstance(value, str) or prev in self.ones:
                    if prev in self.tens and ones < 10:  # replace the last zero
                        value = value[:-1] + str(ones)
                    else:
                        value = str(value) + str(ones)
                elif ones < 10:
                    if value % 10 == 0:
                        value += ones
                    else:
                        value = str(value) + str(ones)
                else:  # eleven to nineteen
                    if value % 100 == 0:
                        value += ones
                    else:
                        value = str(value) + str(ones)
            elif current in self.ones_suffixed:
                # ordinal or cardinal; yield the number right away
                ones, suffix = self.ones_suffixed[current]
                if value is None:
                    yield output(str(ones) + suffix)
                elif isinstance(value, str) or prev in self.ones:
                    if prev in self.tens and ones < 10:
                        yield output(value[:-1] + str(ones) + suffix)
                    else:
                        yield output(str(value) + str(ones) + suffix)
                elif ones < 10:
                    if value % 10 == 0:
                        yield output(str(value + ones) + suffix)
                    else:
                        yield output(str(value) + str(ones) + suffix)
                else:  # eleven to nineteen
                    if value % 100 == 0:
                        yield output(str(value + ones) + suffix)
                    else:
                        yield output(str(value) + str(ones) + suffix)
                value = None
            elif current in self.tens:
                tens = self.tens[current]
                if value is None:
                    value = tens
                elif isinstance(value, str):
                    value = str(value) + str(tens)
                else:
                    if value % 100 == 0:
                        value += tens
                    else:
                        value = str(value) + str(tens)
            elif current in self.tens_suffixed:
                # ordinal or cardinal; yield the number right away
                tens, suffix = self.tens_suffixed[current]
                if value is None:
                    yield output(str(tens) + suffix)
                elif isinstance(value, str):
                    yield output(str(value) + str(tens) + suffix)
                else:
                    if value % 100 == 0:
                        yield output(str(value + tens) + suffix)
                    else:
                        yield output(str(value) + str(tens) + suffix)
            elif current in self.multipliers:
                multiplier = self.multipliers[current]
                if value is None:
                    value = multiplier
                elif isinstance(value, str) or value == 0:
                    f = to_fraction(value)
                    p = f * multiplier if f is not None else None
                    if f is not None and p.denominator == 1:
                        value = p.numerator
                    else:
                        yield output(value)
                        value = multiplier
                else:
                    before = value // 1000 * 1000
                    residual = value % 1000
                    value = before + residual * multiplier
            elif current in self.multipliers_suffixed:
                multiplier, suffix = self.multipliers_suffixed[current]
                if value is None:
                    yield output(str(multiplier) + suffix)
                elif isinstance(value, str):
                    f = to_fraction(value)
                    p = f * multiplier if f is not None else None
                    if f is not None and p.denominator == 1:
                        yield output(str(p.numerator) + suffix)
                    else:
                        yield output(value)
                        yield output(str(multiplier) + suffix)
                else:  # int
                    before = value // 1000 * 1000
                    residual = value % 1000
                    value = before + residual * multiplier
                    yield output(str(value) + suffix)
                value = None
            elif current in self.preceding_prefixers:
                # apply prefix (positive, minus, etc.) if it precedes a number
                if value is not None:
                    yield output(value)
                if next_w in self.words or next_is_numeric:
                    prefix = self.preceding_prefixers[current]
                else:
                    yield output(current)
            elif current in self.following_prefixers:
                # apply prefix (dollars, cents, etc.) only after a number
                if value is not None:
                    prefix = self.following_prefixers[current]
                    yield output(value)
                else:
                    yield output(current)
            elif current in self.suffixers:
                # apply suffix symbols (percent -> '%')
                if value is not None:
                    suffixer = self.suffixers[current]
                    if isinstance(suffixer, dict):
                        if next_w in suffixer:
                            yield output(str(value) + suffixer[next_w])
                            skip = True
                        else:
                            yield output(value)
                            yield output(current)
                    else:
                        yield output(str(value) + suffixer)
                else:
                    yield output(current)
            elif current in self.specials:
                if next_w not in self.words and not next_is_numeric:
                    # apply special handling only if the next word can be numeric
                    if value is not None:
                        yield output(value)
                    yield output(current)
                elif current == "and":
                    # ignore "and" after hundreds, thousands, etc.
                    if prev not in self.multipliers:
                        if value is not None:
                            yield output(value)
                        yield output(current)
                elif current in ("double", "triple"):
                    if next_w in self.ones or next_w in self.zeros:
                        repeats = 2 if current == "double" else 3
                        ones = self.ones.get(next_w, 0)
                        value = str(value or "") + str(ones) * repeats
                        skip = True
                    else:
                        if value is not None:
                            yield output(value)
                        yield output(current)
                elif current == "point":
                    if next_w in self.decimals or next_is_numeric:
                        value = str(value or "") + "."
                else:
                    raise ValueError(f"Unexpected token: {current}")
            else:
                raise ValueError(f"Unexpected token: {current}")

        if value is not None:
            yield output(value)

    def preprocess(self, s: str) -> str:
        # replace "<number> and a half" with "<number> point five"
        results = []
        segments = re.split(r"\band\s+a\s+half\b", s)
        for i, segment in enumerate(segments):
            if len(segment.strip()) == 0:
                continue
            if i == len(segments) - 1:
                results.append(segment)
            else:
                results.append(segment)
                last_word = segment.rsplit(maxsplit=2)[-1]
                if last_word in self.decimals or last_word in self.multipliers:
                    results.append("point five")
                else:
                    results.append("and a half")
        s = " ".join(results)

        # put a space at number/letter boundary
        s = re.sub(r"([a-z])([0-9])", r"\1 \2", s)
        s = re.sub(r"([0-9])([a-z])", r"\1 \2", s)

        # but remove spaces which could be a suffix
        s = re.sub(r"([0-9])\s+(st|nd|rd|th|s)\b", r"\1\2", s)
        return s

    def postprocess(self, s: str) -> str:
        def combine_cents(m: re.Match) -> str:
            try:
                currency = m.group(1)
                integer = m.group(2)
                cents = int(m.group(3))
                return f"{currency}{integer}.{cents:02d}"
            except ValueError:
                return m.string

        def extract_cents(m: re.Match) -> str:
            try:
                return f"¢{int(m.group(1))}"
            except ValueError:
                return m.string

        # apply currency postprocessing; "$2 and ¢7" -> "$2.07"
        s = re.sub(r"([€£$])([0-9]+) (?:and )?¢([0-9]{1,2})\b", combine_cents, s)
        s = re.sub(r"[€£$]0.([0-9]{1,2})\b", extract_cents, s)

        # write "one(s)" instead of "1(s)", just for readability
        s = re.sub(r"\b1(s?)\b", r"one\1", s)
        return s

    def __call__(self, s: str) -> str:
        s = self.preprocess(s)
        s = " ".join(word for word in self.process_words(s.split()) if word is not None)
        s = self.postprocess(s)
        return s


class EnglishSpellingNormalizer:
    """British -> American spellings.

    The upstream normalizer loads a 1,700-entry mapping from the model
    repository's ``english.json``; that file is not available offline, so
    this ships a curated high-frequency subset (same mechanism: exact
    word lookup, one pass). Pass a custom mapping to extend/replace it.
    """

    def __init__(self, mapping: dict[str, str] | None = None) -> None:
        self.mapping = DEFAULT_SPELLING_MAPPING if mapping is None else mapping

    def __call__(self, s: str) -> str:
        return " ".join(self.mapping.get(word, word) for word in s.split())


class EnglishTextNormalizer:
    """The full normalization pipeline WER is computed under."""

    def __init__(self, spelling_mapping: dict[str, str] | None = None) -> None:
        self.ignore_patterns = r"\b(hmm|mm|mhm|mmm|uh|um)\b"
        self.replacers = {
            # common contractions
            r"\bwon't\b": "will not",
            r"\bcan't\b": "can not",
            r"\blet's\b": "let us",
            r"\bain't\b": "aint",
            r"\by'all\b": "you all",
            r"\bwanna\b": "want to",
            r"\bgotta\b": "got to",
            r"\bgonna\b": "going to",
            r"\bi'ma\b": "i am going to",
            r"\bimma\b": "i am going to",
            r"\bwoulda\b": "would have",
            r"\bcoulda\b": "could have",
            r"\bshoulda\b": "should have",
            r"\bma'am\b": "madam",
            # contractions in titles/prefixes
            r"\bmr\b": "mister ",
            r"\bmrs\b": "missus ",
            r"\bst\b": "saint ",
            r"\bdr\b": "doctor ",
            r"\bprof\b": "professor ",
            r"\bcapt\b": "captain ",
            r"\bgov\b": "governor ",
            r"\bald\b": "alderman ",
            r"\bgen\b": "general ",
            r"\bsen\b": "senator ",
            r"\brep\b": "representative ",
            r"\bpres\b": "president ",
            r"\brev\b": "reverend ",
            r"\bhon\b": "honorable ",
            r"\basst\b": "assistant ",
            r"\bassoc\b": "associate ",
            r"\blt\b": "lieutenant ",
            r"\bcol\b": "colonel ",
            r"\bjr\b": "junior ",
            r"\bsr\b": "senior ",
            r"\besq\b": "esquire ",
            # prefect tenses, ideally it should be any past participles, but it's harder..
            r"'d been\b": " had been",
            r"'s been\b": " has been",
            r"'d gone\b": " had gone",
            r"'s gone\b": " has gone",
            r"'d done\b": " had done",  # "'s done" is ambiguous
            r"'s got\b": " has got",
            # general contractions
            r"n't\b": " not",
            r"n't've\b": " not have",
            r"'re\b": " are",
            r"'s\b": " is",
            r"'d\b": " would",
            r"'ll\b": " will",
            r"'t\b": " not",
            r"'ve\b": " have",
            r"'m\b": " am",
        }
        self.standardize_numbers = EnglishNumberNormalizer()
        self.standardize_spellings = EnglishSpellingNormalizer(spelling_mapping)

    def __call__(self, s: str) -> str:
        s = s.lower()

        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # remove words between brackets
        s = re.sub(r"\(([^)]+?)\)", "", s)  # remove words between parenthesis
        s = re.sub(self.ignore_patterns, "", s)
        s = re.sub(r"\s+'", "'", s)  # standardize when there's a space before an apostrophe

        for pattern, replacement in self.replacers.items():
            s = re.sub(pattern, replacement, s)

        s = re.sub(r"(\d),(\d)", r"\1\2", s)  # remove commas between digits
        s = re.sub(r"\.([^0-9]|$)", r" \1", s)  # remove periods not followed by numbers
        s = remove_symbols_and_diacritics(s, keep=".%$¢€£")  # keep numeric symbols

        s = self.standardize_numbers(s)
        s = self.standardize_spellings(s)

        # now remove prefix/suffix symbols that are not preceded/followed by numbers
        s = re.sub(r"[.$¢€£]([^0-9])", r" \1", s)
        s = re.sub(r"([^0-9])%", r"\1 ", s)

        # NB: faithful to the reference, which collapses whitespace but does
        # NOT strip (callers that need a clean string strip themselves)
        s = re.sub(r"\s+", " ", s)  # replace any successive whitespaces with a space
        return s


# Curated high-frequency British -> American spellings (upstream mechanism,
# subset of the model-repo english.json which is unavailable offline).
DEFAULT_SPELLING_MAPPING = {
    "accessorise": "accessorize", "acclimatise": "acclimatize",
    "aeroplane": "airplane", "aesthetic": "esthetic", "ageing": "aging",
    "aluminium": "aluminum", "amortise": "amortize", "analogue": "analog",
    "analyse": "analyze", "analysed": "analyzed", "analyses": "analyzes",
    "analysing": "analyzing", "anticlockwise": "counterclockwise",
    "apologise": "apologize", "apologised": "apologized",
    "apologises": "apologizes", "apologising": "apologizing",
    "arbour": "arbor", "ardour": "ardor", "armour": "armor",
    "armoured": "armored", "armoury": "armory", "artefact": "artifact",
    "authorise": "authorize", "authorised": "authorized",
    "authorises": "authorizes", "authorising": "authorizing",
    "behaviour": "behavior", "behaviours": "behaviors", "belabour": "belabor",
    "calibre": "caliber", "cancelled": "canceled", "cancelling": "canceling",
    "candour": "candor", "capitalise": "capitalize",
    "capitalised": "capitalized", "carburettor": "carburetor",
    "catalogue": "catalog", "catalogued": "cataloged",
    "catalogues": "catalogs", "categorise": "categorize",
    "categorised": "categorized", "centimetre": "centimeter",
    "centimetres": "centimeters", "centre": "center", "centred": "centered",
    "centres": "centers", "characterise": "characterize",
    "characterised": "characterized", "cheque": "check", "cheques": "checks",
    "chequered": "checkered", "chilli": "chili", "civilisation": "civilization",
    "civilise": "civilize", "civilised": "civilized", "clamour": "clamor",
    "colonise": "colonize", "colonised": "colonized", "colour": "color",
    "coloured": "colored", "colourful": "colorful", "colouring": "coloring",
    "colours": "colors", "commercialise": "commercialize",
    "compartmentalise": "compartmentalize", "conceptualise": "conceptualize",
    "cosier": "cozier", "cosy": "cozy", "councillor": "councilor",
    "councillors": "councilors", "counselled": "counseled",
    "counselling": "counseling", "counsellor": "counselor",
    "counsellors": "counselors", "criticise": "criticize",
    "criticised": "criticized", "criticises": "criticizes",
    "criticising": "criticizing", "crystallise": "crystallize",
    "customise": "customize", "customised": "customized",
    "defence": "defense", "defences": "defenses", "demeanour": "demeanor",
    "demonise": "demonize", "dialled": "dialed", "dialling": "dialing",
    "dialogue": "dialog", "dialogues": "dialogs", "diarrhoea": "diarrhea",
    "digitise": "digitize", "digitised": "digitized",
    "disorganised": "disorganized", "dramatise": "dramatize",
    "dreamt": "dreamed", "emphasise": "emphasize", "emphasised": "emphasized",
    "emphasises": "emphasizes", "emphasising": "emphasizing",
    "endeavour": "endeavor", "endeavours": "endeavors", "enrol": "enroll",
    "enrolment": "enrollment", "epicentre": "epicenter", "equalise": "equalize",
    "favour": "favor", "favourable": "favorable", "favoured": "favored",
    "favourite": "favorite", "favourites": "favorites", "favours": "favors",
    "fervour": "fervor", "fibre": "fiber", "fibres": "fibers",
    "finalise": "finalize", "finalised": "finalized", "flavour": "flavor",
    "flavoured": "flavored", "flavours": "flavors", "foetus": "fetus",
    "formalise": "formalize", "fuelled": "fueled", "fuelling": "fueling",
    "fulfil": "fulfill", "fulfilment": "fulfillment", "galvanise": "galvanize",
    "generalise": "generalize", "generalised": "generalized",
    "glamour": "glamor", "globalisation": "globalization",
    "globalise": "globalize", "grey": "gray", "greyish": "grayish",
    "harbour": "harbor", "harbours": "harbors", "harmonise": "harmonize",
    "honour": "honor", "honourable": "honorable", "honoured": "honored",
    "honours": "honors", "hospitalised": "hospitalized", "humour": "humor",
    "humoured": "humored", "idealise": "idealize", "immobilise": "immobilize",
    "immunise": "immunize", "improvise": "improvise",
    "industrialise": "industrialize", "initialise": "initialize",
    "initialised": "initialized", "instalment": "installment",
    "instalments": "installments", "internalise": "internalize",
    "itemise": "itemize", "jewellery": "jewelry", "judgement": "judgment",
    "kerb": "curb", "kilometre": "kilometer", "kilometres": "kilometers",
    "labelled": "labeled", "labelling": "labeling", "labour": "labor",
    "laboured": "labored", "labourer": "laborer", "labourers": "laborers",
    "labours": "labors", "legalise": "legalize", "legalised": "legalized",
    "licence": "license", "licences": "licenses", "litre": "liter",
    "litres": "liters", "localise": "localize", "localised": "localized",
    "lustre": "luster", "marginalise": "marginalize",
    "marginalised": "marginalized", "marvelled": "marveled",
    "marvellous": "marvelous", "materialise": "materialize",
    "maximise": "maximize", "maximised": "maximized", "meagre": "meager",
    "mechanise": "mechanize", "memorise": "memorize", "memorised": "memorized",
    "metre": "meter", "metres": "meters", "minimise": "minimize",
    "minimised": "minimized", "mobilise": "mobilize", "mobilised": "mobilized",
    "modelled": "modeled", "modelling": "modeling", "modernise": "modernize",
    "modernised": "modernized", "monetise": "monetize", "mould": "mold",
    "moulded": "molded", "moustache": "mustache", "neighbour": "neighbor",
    "neighbourhood": "neighborhood", "neighbourhoods": "neighborhoods",
    "neighbouring": "neighboring", "neighbours": "neighbors",
    "normalise": "normalize", "normalised": "normalized", "odour": "odor",
    "odours": "odors", "offence": "offense", "offences": "offenses",
    "optimise": "optimize", "optimised": "optimized", "organisation": "organization",
    "organisations": "organizations", "organise": "organize",
    "organised": "organized", "organiser": "organizer",
    "organisers": "organizers", "organises": "organizes",
    "organising": "organizing", "paralyse": "paralyze",
    "paralysed": "paralyzed", "parlour": "parlor", "patronise": "patronize",
    "penalise": "penalize", "penalised": "penalized",
    "personalise": "personalize", "personalised": "personalized",
    "plough": "plow", "ploughed": "plowed", "polarise": "polarize",
    "popularise": "popularize", "practise": "practice",
    "practised": "practiced", "practising": "practicing",
    "prioritise": "prioritize", "prioritised": "prioritized",
    "privatise": "privatize", "privatised": "privatized",
    "programme": "program", "programmes": "programs", "publicise": "publicize",
    "publicised": "publicized", "pyjamas": "pajamas", "quarrelled": "quarreled",
    "rationalise": "rationalize", "realisation": "realization",
    "realise": "realize", "realised": "realized", "realises": "realizes",
    "realising": "realizing", "recognise": "recognize",
    "recognised": "recognized", "recognises": "recognizes",
    "recognising": "recognizing", "rigour": "rigor", "rumour": "rumor",
    "rumoured": "rumored", "rumours": "rumors", "sabre": "saber",
    "sanitise": "sanitize", "satirise": "satirize", "savour": "savor",
    "savoured": "savored", "savoury": "savory", "sceptical": "skeptical",
    "scrutinise": "scrutinize", "scrutinised": "scrutinized",
    "signalled": "signaled", "signalling": "signaling",
    "socialise": "socialize", "socialised": "socialized",
    "sombre": "somber", "specialise": "specialize",
    "specialised": "specialized", "spectre": "specter", "spelt": "spelled",
    "splendour": "splendor", "stabilise": "stabilize",
    "stabilised": "stabilized", "standardise": "standardize",
    "standardised": "standardized", "sterilise": "sterilize",
    "subsidise": "subsidize", "subsidised": "subsidized",
    "summarise": "summarize", "summarised": "summarized",
    "symbolise": "symbolize", "sympathise": "sympathize",
    "synchronise": "synchronize", "synthesise": "synthesize",
    "terrorise": "terrorize", "theatre": "theater", "theatres": "theaters",
    "tonne": "ton", "tonnes": "tons", "traumatised": "traumatized",
    "travelled": "traveled", "traveller": "traveler",
    "travellers": "travelers", "travelling": "traveling",
    "tumour": "tumor", "tumours": "tumors", "tyre": "tire", "tyres": "tires",
    "unauthorised": "unauthorized", "unrecognised": "unrecognized",
    "utilise": "utilize", "utilised": "utilized", "valour": "valor",
    "vapour": "vapor", "vigour": "vigor", "visualise": "visualize",
    "visualised": "visualized", "vocalise": "vocalize",
    "whisky": "whiskey", "woollen": "woolen",
}
