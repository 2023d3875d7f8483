"""Tokenizer parity fixtures lifted from the reference's unit tests
(/root/reference/src/stems.rs:66-233) plus extra Porter2 checks."""

from noise_spark.analysis import porter2, stems


def test_stems_mixedcase():
    # src/stems.rs:71-109
    assert stems("THEse Words deeplY test smOOthly that stemmING") == [
        (0, "these"),
        (1, "word"),
        (2, "deepli"),
        (3, "test"),
        (4, "smooth"),
        (5, "that"),
        (6, "stem"),
    ]


def test_stems_nonchars():
    # src/stems.rs:111-122 — all-non-alpha text yields one raw token
    assert stems("  @#$!== \t+-") == [(0, "  @#$!== \t+-")]


def test_stems_some_nonchars():
    # src/stems.rs:124-142
    assert stems("@!?   Let's seeing...") == [(0, "let"), (1, "see")]


def test_stems_unicode():
    # src/stems.rs:144-162
    assert stems("Ünicöde stemming") == [(0, "ünicöd"), (1, "stem")]


def test_stems_trailing_needs_normalized():
    # src/stems.rs:164-182 — ™ NFKC-expands to "tm", an alphabetic token
    assert stems("Didgeridoos™") == [(0, "didgeridoo"), (1, "tm")]


def test_stems_unicode_lowercase_has_more_bytes():
    # src/stems.rs:184-196
    assert stems("İ") == [(0, "i̇")]


def test_stems_unicode_lowercase_has_less_bytes():
    # src/stems.rs:219-232
    inp = "Ρ̓ῤῤ"
    assert stems(inp) == [(0, "ῤῤῤ")]


def test_empty_text():
    assert stems("") == [(0, "")]


def test_porter2_known_words():
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "ties": "tie",
        "caress": "caress",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "bled": "bled",
        "motoring": "motor",
        "sing": "sing",
        "conflated": "conflat",
        "troubled": "troubl",
        "sized": "size",
        "hopping": "hop",
        "tanned": "tan",
        "falling": "fall",
        "hissing": "hiss",
        "fizzed": "fizz",
        "failing": "fail",
        "filing": "file",
        "happy": "happi",
        "sky": "sky",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "valenci": "valenc",
        "hesitanci": "hesit",
        "digitizer": "digit",
        "conformabli": "conform",
        "radicalli": "radic",
        "differentli": "differ",
        "vileli": "vile",
        "analogousli": "analog",
        "vietnamization": "vietnam",
        "predication": "predic",
        "operator": "oper",
        "feudalism": "feudal",
        "decisiveness": "decis",
        "hopefulness": "hope",
        "callousness": "callous",
        "formaliti": "formal",
        "sensitiviti": "sensit",
        "sensibiliti": "sensibl",
        "triplicate": "triplic",
        "formative": "format",
        "formalize": "formal",
        "electriciti": "electr",
        "electrical": "electr",
        "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "airliner": "airlin",
        "gyroscopic": "gyroscop",
        "adjustable": "adjust",
        "defensible": "defens",
        "irritant": "irrit",
        "replacement": "replac",
        "adjustment": "adjust",
        "dependent": "depend",
        "adoption": "adopt",
        "communism": "communism",
        "activate": "activ",
        "angulariti": "angular",
        "homologous": "homolog",
        "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat",
        "rate": "rate",
        "cease": "ceas",
        "controll": "control",
        "roll": "roll",
        "dying": "die",
        "news": "news",
        "generate": "generat",
        "generously": "generous",
    }
    for w, expected in cases.items():
        assert porter2.stem(w) == expected, f"{w}: {porter2.stem(w)} != {expected}"


def test_whitespace_analyzer_matches_sql_split():
    from noise_spark.analysis import whitespace_terms

    assert whitespace_terms("a b  c") == [(0, "a"), (1, "b"), (2, ""), (3, "c")]
