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
