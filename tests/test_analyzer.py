from neural_search_ray.analysis import ENGLISH_STOPWORDS, analyze, tokenize
from neural_search_ray.analysis.analyzer import term_frequencies
from neural_search_ray.config import AnalyzerConfig


def test_basic_tokenize():
    assert tokenize("The quick Brown fox") == ["the", "quick", "brown", "fox"]


def test_mid_letter_joins():
    # UAX#29 WB6/WB7-style joins (Lucene StandardTokenizer behavior)
    assert tokenize("don't stop") == ["don't", "stop"]
    assert tokenize("example.com is up") == ["example.com", "is", "up"]
    assert tokenize("pi is 3.14") == ["pi", "is", "3.14"]
    assert tokenize("1,024 bytes") == ["1,024", "bytes"]


def test_splitting_punct():
    assert tokenize("e-mail me") == ["e", "mail", "me"]
    assert tokenize("foo_bar") == ["foo", "bar"]
    assert tokenize("a...b") == ["a", "b"]  # only single joiners join
    assert tokenize("end. Start") == ["end", "start"]


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize("   \n\t  ") == []
    assert analyze([None, "a b"]) == [[], ["a", "b"]]


def test_stopwords():
    cfg = AnalyzerConfig(remove_stopwords=True)
    assert tokenize("the cat and the hat", cfg) == ["cat", "hat"]
    assert len(ENGLISH_STOPWORDS) == 33


def test_no_lowercase():
    cfg = AnalyzerConfig(lowercase=False)
    assert tokenize("The Cat", cfg) == ["The", "Cat"]


def test_max_token_length_split():
    cfg = AnalyzerConfig(max_token_length=4)
    assert tokenize("abcdefghij x", cfg) == ["abcd", "efgh", "ij", "x"]


def test_unicode():
    assert tokenize("café naïve 東京") == ["café", "naïve", "東京"]


def test_term_frequencies():
    assert term_frequencies(["a", "b", "a"]) == {"a": 2, "b": 1}


GOLDEN_TOKENS = [
    # (input, expected standard-analyzer tokens) — pinned corpus for the
    # UAX#29-style corner cases (SURVEY.md §7.4 analyzer parity)
    ("The quick (\"brown\") fox can't jump 32.3 feet, right?",
     ["the", "quick", "brown", "fox", "can't", "jump", "32.3", "feet", "right"]),
    ("XY&Z Corporation - xyz@example.com",
     ["xy", "z", "corporation", "xyz", "example.com"]),
    ("visit https://sub.example.co.uk/path?q=1",
     ["visit", "https", "sub.example.co.uk", "path", "q", "1"]),
    ("店舗情報 and ラーメン",
     ["店舗情報", "and", "ラーメン"]),
    ("naïve café résumé", ["naïve", "café", "résumé"]),
    ("O'Neill's 3,000,000 wins", ["o'neill's", "3,000,000", "wins"]),
    ("a-b a_b a.b a..b", ["a", "b", "a", "b", "a.b", "a", "b"]),
    ("emoji 👍 splits", ["emoji", "splits"]),
    ("v1.2.3 IPv4 127.0.0.1", ["v1.2.3", "ipv4", "127.0.0.1"]),
    ("", []),
]


def test_golden_token_corpus():
    for text, want in GOLDEN_TOKENS:
        assert tokenize(text) == want, text


def test_golden_corpus_fast_path_consistent():
    """analyze_column must agree with tokenize() on the golden corpus
    (mixed simple/non-simple rows exercise the stitch path)."""
    import pyarrow as pa

    from neural_search_ray.analysis.analyzer import analyze_column

    texts = [t for t, _ in GOLDEN_TOKENS] + ["plain simple text 123"]
    got = analyze_column(pa.array(texts, type=pa.string())).to_pylist()
    want = [tokenize(t) for t in texts]
    assert got == want


class TestTokenizerVariants:
    """Golden tokens for the chunker-whitelist variants
    (FixedTokenLengthChunker.java:56-64)."""

    def _tk(self, text, variant):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import AnalyzerConfig

        return tokenize(text, AnalyzerConfig(tokenizer=variant, remove_stopwords=False))

    def test_uax_url_email(self):
        t = "visit https://example.com/a?b=1 or mail bob.smith+x@mail.example.org now"
        assert self._tk(t, "uax_url_email") == [
            "visit", "https://example.com/a?b=1", "or", "mail",
            "bob.smith+x@mail.example.org", "now",
        ]
        # plain words identical to standard (the SQL-oracle precondition)
        plain = "merge sort window data 42"
        assert self._tk(plain, "uax_url_email") == self._tk(plain, "standard")

    def test_uax_url_shatters_under_standard(self):
        t = "see https://example.com/a"
        assert self._tk(t, "standard") == ["see", "https", "example.com", "a"]

    def test_classic(self):
        assert self._tk("U.S.A X-25 wi-fi don't example.com 3.14", "classic") == [
            "u.s.a", "x-25", "wi", "fi", "don't", "example.com", "3.14",
        ]
        assert self._tk("a-b@c.org", "classic")[0] == "a-b@c.org"

    def test_thai_runs_dictionary_segmented(self):
        # round-3: Thai runs are dictionary-segmented (maximal matching),
        # no longer emitted whole — สวัสดี + ครับ are separate lexicon words
        assert self._tk("hello สวัสดีครับ world", "thai") == [
            "hello", "สวัสดี", "ครับ", "world",
        ]

    def test_lowercase_is_letter_boundaries(self):
        assert self._tk("Foo3Bar baz-qux", "lowercase") == ["foo", "bar", "baz", "qux"]
        assert self._tk("Foo3Bar", "letter") == ["foo", "bar"]

    def test_chunker_accepts_variants(self):
        from neural_search_ray.stages.chunkers import chunk_fixed_token_length

        text = "go to https://a.example.com/x then stop here now ok"
        # uax: the URL is one token; standard: it shatters into three
        uax = chunk_fixed_token_length(text, token_limit=3, tokenizer="uax_url_email")
        std = chunk_fixed_token_length(text, token_limit=3, tokenizer="standard")
        assert len(uax) < len(std)
        assert "".join(c for c in uax) == text  # zero-overlap chunks cover text


class TestThaiSegmentation:
    """Dictionary maximal-matching (analysis/thai.py) — the mechanism the
    reference gets from Lucene ThaiTokenizer/ICU, tested with both the
    embedded starter lexicon and a caller-supplied dictionary."""

    def test_known_words_segment(self):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(tokenizer="thai")
        # "hello" + "thank you" run together: both in the starter lexicon
        toks = tokenize("สวัสดีขอบคุณ", cfg)
        assert toks == ["สวัสดี", "ขอบคุณ"]

    def test_unknown_span_accumulates(self):
        from neural_search_ray.analysis.thai import ThaiSegmenter

        seg = ThaiSegmenter()
        # junk Thai-block chars not in the lexicon stay one token,
        # bounded by the known words around them
        out = seg.segment("สวัสดี" + "๛๛" + "ปลา")
        assert out == ["สวัสดี", "๛๛", "ปลา"]

    def test_longest_match_wins(self):
        from neural_search_ray.analysis.thai import ThaiSegmenter

        seg = ThaiSegmenter()
        # ประเทศไทย (Thailand) must win over ประเทศ + ไทย
        assert seg.segment("ประเทศไทย") == ["ประเทศไทย"]

    def test_custom_dictionary(self):
        from neural_search_ray.analysis.thai import ThaiSegmenter

        seg = ThaiSegmenter(words=["กขค", "งจฉ"])
        assert seg.segment("กขคงจฉ") == ["กขค", "งจฉ"]
        seg.add_words(["ชซฌ"])
        assert seg.segment("ชซฌกขค") == ["ชซฌ", "กขค"]

    def test_mixed_thai_english(self):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(tokenizer="thai")
        toks = tokenize("hello สวัสดี world", cfg)
        assert toks == ["hello", "สวัสดี", "world"]

    def test_golden_paragraph_all_dictionary_words(self):
        """A real multi-sentence Thai paragraph (no spaces, the normal
        Thai writing convention) must segment entirely into dictionary
        words with the embedded lexicon — no unknown-span fallbacks."""
        from neural_search_ray.analysis.thai import ThaiSegmenter

        seg = ThaiSegmenter()
        # "Today I went to school with friends. In the morning the
        # teacher taught Thai and mathematics. At noon we ate fried rice
        # at a restaurant near the school; the food was delicious. In
        # the evening I went home, read a book, then slept."
        para = (
            "วันนี้ฉันไปโรงเรียนกับเพื่อนตอนเช้าครูสอนภาษาไทยและคณิตศาสตร์"
            "ตอนเที่ยงเรากินข้าวผัดที่ร้านอาหารใกล้โรงเรียนอาหารอร่อยมาก"
            "ตอนเย็นฉันกลับบ้านอ่านหนังสือแล้วนอน"
        )
        toks = seg.segment(para)
        assert toks == [
            "วันนี้", "ฉัน", "ไป", "โรงเรียน", "กับ", "เพื่อน", "ตอน",
            "เช้า", "ครู", "สอน", "ภาษาไทย", "และ", "คณิตศาสตร์", "ตอน",
            "เที่ยง", "เรา", "กิน", "ข้าวผัด", "ที่", "ร้านอาหาร",
            "ใกล้", "โรงเรียน", "อาหาร", "อร่อย", "มาก", "ตอน", "เย็น",
            "ฉัน", "กลับ", "บ้าน", "อ่าน", "หนังสือ", "แล้ว", "นอน",
        ]
        assert all(t in seg._words for t in toks)

    def test_golden_paragraph_r5_extension(self):
        """Second golden paragraph over the r5 lexicon extension
        (months, daily-routine verbs, household nouns): 'On Saturday
        morning in April I exercise, shower, then cook and do laundry.
        In the evening I ride a bicycle with a friend; my boss
        telephones about a meeting on Monday.'"""
        from neural_search_ray.analysis.thai import ThaiSegmenter

        seg = ThaiSegmenter()
        para = (
            "เช้าวันเสาร์เดือนเมษายนฉันออกกำลังกายอาบน้ำแล้วทำอาหารซักผ้า"
            "ตอนเย็นฉันขี่จักรยานกับเพื่อนเจ้านายโทรมาเรื่องประชุมวันจันทร์"
        )
        toks = seg.segment(para)
        assert toks == [
            "เช้า", "วันเสาร์", "เดือน", "เมษายน", "ฉัน", "ออกกำลังกาย",
            "อาบน้ำ", "แล้ว", "ทำอาหาร", "ซักผ้า", "ตอน", "เย็น", "ฉัน",
            "ขี่", "จักรยาน", "กับ", "เพื่อน", "เจ้านาย", "โทร", "มา",
            "เรื่อง", "ประชุม", "วันจันทร์",
        ]
        assert all(t in seg._words for t in toks)

    def test_lexicon_is_thai_and_sizeable(self):
        from neural_search_ray.analysis.thai import (
            _STARTER_LEXICON, _THAI_RUN_RE,
        )

        assert len(set(_STARTER_LEXICON)) > 600
        assert all(_THAI_RUN_RE.match(w) for w in _STARTER_LEXICON)


class TestEnglishTokenFilters:
    """analysis/stem.py — Lucene EnglishPossessiveFilter +
    EnglishMinimalStemmer (Harman S-stemmer) parity, python and
    vectorized forms."""

    # Lucene-pinned goldens (EnglishMinimalStemmer rule table)
    GOLDEN = [
        ("cats", "cat"), ("ponies", "pony"), ("queries", "query"),
        ("ties", "ty"), ("caresses", "caresse"), ("caress", "caress"),
        ("focus", "focus"), ("gas", "ga"), ("goes", "goes"),
        ("sees", "sees"), ("trees", "trees"), ("toes", "toes"),
        ("abyss", "abyss"), ("is", "is"), ("s", "s"), ("", ""),
        ("ies", "ies"), ("aies", "aies"), ("eies", "eies"),
        ("dies", "dy"), ("w00015s", "w00015"), ("datas", "data"),
    ]

    def test_minimal_english_goldens(self):
        from neural_search_ray.analysis.stem import stem_minimal_english_token

        for w, want in self.GOLDEN:
            assert stem_minimal_english_token(w) == want, w

    def test_possessive_goldens(self):
        from neural_search_ray.analysis.stem import strip_possessive_token

        for w, want in [
            ("john's", "john"), ("james’s", "james"), ("'s", ""),
            ("s", "s"), ("cats", "cats"), ("o'briens", "o'briens"),
        ]:
            assert strip_possessive_token(w) == want, w

    def test_vectorized_equals_python(self):
        import pyarrow as pa

        from neural_search_ray.analysis.stem import (
            apply_token_filters, apply_token_filters_flat,
        )

        words = [w for w, _ in self.GOLDEN] + [
            "john's", "james’s", "'s", "us", "ss", "class", "bus",
            "windows", "tables", "files", "alias", "axes", "boxes",
        ]
        got = apply_token_filters_flat(
            pa.array(words, type=pa.string()), True, "minimal_english"
        ).to_pylist()
        want = [apply_token_filters(w, True, "minimal_english") for w in words]
        assert got == want

    def test_analyzer_chain_order_and_config(self):
        """Stopwords judged on the UNstemmed token; empty tokens dropped;
        unknown stemmer refused; old manifests (no stemmer key) load."""
        import pytest as _pytest

        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(stemmer="minimal_english", strip_possessive=True)
        # "as" is a stopword only when remove_stopwords; unstemmed "its"
        # is NOT in the stop set -> stemmed to "it" (which IS a stopword
        # — proves stop ran before stem)
        cfg_stop = AnalyzerConfig(
            stemmer="minimal_english", remove_stopwords=True
        )
        assert tokenize("its cats", cfg_stop) == ["it", "cat"]
        assert tokenize("john's ponies", cfg) == ["john", "pony"]
        with _pytest.raises(ValueError, match="stemmer"):
            AnalyzerConfig(stemmer="porter")
        assert AnalyzerConfig(**{"lowercase": True}).stemmer == "none"

    def test_analyze_column_stemmed_matches_tokenize(self):
        import pyarrow as pa

        from neural_search_ray.analysis.analyzer import analyze_column
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(stemmer="minimal_english", strip_possessive=True)
        texts = [
            "Data Queries fast joins", "", None, "john's 's s",
            "simple ascii rows stay fast", "Ünïcode Pönies don't",
            "x" * 300 + "s",
        ]
        col = pa.array(texts, type=pa.string())
        got = analyze_column(col, cfg).to_pylist()
        from neural_search_ray.analysis.analyzer import tokenize

        assert got == [tokenize(t or "", cfg) for t in texts]

    def test_stem_sql_expr_matches_python(self):
        import duckdb

        from neural_search_ray.analysis.stem import (
            stem_minimal_english_token, stem_sql_expr,
        )

        words = [w for w, _ in self.GOLDEN if w] + [
            "windows", "tables", "alias", "axes", "bliss", "genus",
            "studies", "dazes", "shoes", "knees",
        ]
        con = duckdb.connect()
        got = con.execute(
            f"SELECT list_transform($1, x -> {stem_sql_expr('x')})", [words]
        ).fetchone()[0]
        assert got == [stem_minimal_english_token(w) for w in words]


class TestAsciiFolding:
    """ASCIIFoldingFilter subset (analysis/stem.py fold table)."""

    def test_golden_tokens(self):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(fold_ascii=True)
        assert tokenize("dátá quéry", cfg) == ["data", "query"]
        assert tokenize("Ærø São Þór", cfg) == ["aero", "sao", "thor"]
        assert tokenize("straße łódź", cfg) == ["strasse", "lodz"]

    def test_flat_gate_identity_on_ascii(self):
        import pyarrow as pa

        from neural_search_ray.analysis.stem import fold_ascii_flat

        flat = pa.array(["plain", "ascii", "tokens"])
        out = fold_ascii_flat(flat)
        assert out is flat  # gate short-circuits, no copy

    def test_flat_scatter(self):
        import pyarrow as pa

        from neural_search_ray.analysis.stem import fold_ascii_flat

        flat = pa.array(["aá", "b", "çc", "d"])
        assert fold_ascii_flat(flat).to_pylist() == ["aa", "b", "cc", "d"]

    def test_column_matches_tokenize(self):
        import pyarrow as pa

        from neural_search_ray.analysis.analyzer import analyze_column, tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(fold_ascii=True)
        texts = ["dátá and mérge", "plain ascii row", "Straße bâtch"]
        col = pa.array(texts)
        got = analyze_column(col, cfg).to_pylist()
        assert got == [tokenize(t, cfg) for t in texts]

    def test_chain_order_fold_then_stem(self):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(fold_ascii=True, stemmer="minimal_english")
        # fold first: 'tablés' -> 'tables' -> stem -> 'table'
        assert tokenize("tablés", cfg) == ["table"]


class TestCjkBigram:
    """CJKBigramFilter (analysis/cjk.py) — Han-run bigram expansion."""

    def test_token_expansion(self):
        from neural_search_ray.analysis.cjk import expand_cjk_bigrams_tokens

        assert expand_cjk_bigrams_tokens(["一二三"]) == ["一二", "二三"]
        assert expand_cjk_bigrams_tokens(["一"]) == ["一"]
        assert expand_cjk_bigrams_tokens(["abc", "一二", "d"]) == [
            "abc", "一二", "d"
        ]

    def test_tokenize_chain(self):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(cjk_bigram=True)
        assert tokenize("hello 一二三四 ok", cfg) == [
            "hello", "一二", "二三", "三四", "ok"
        ]

    def test_lists_identity_on_ascii(self):
        import pyarrow as pa

        from neural_search_ray.analysis.analyzer import analyze_column
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(cjk_bigram=True)
        col = pa.array(["plain ascii", "more words here"])
        got = analyze_column(col, cfg).to_pylist()
        assert got == [["plain", "ascii"], ["more", "words", "here"]]

    def test_lists_expansion_preserves_rows(self):
        import pyarrow as pa

        from neural_search_ray.analysis.analyzer import analyze_column, tokenize
        from neural_search_ray.config import AnalyzerConfig

        cfg = AnalyzerConfig(cjk_bigram=True)
        texts = ["一二三 abc", "x 四五", "一", "", "mixed 六七八九 tail"]
        got = analyze_column(pa.array(texts), cfg).to_pylist()
        assert got == [tokenize(t, cfg) for t in texts]
