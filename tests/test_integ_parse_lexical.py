"""Ported reference tests: lexical query parsing goldens.

Source: /root/reference/tests/tensor_search/test_utils.py
test_parse_lexical_query (:216-284) — required quoted phrases vs
optional terms, including the full bad-quote-syntax matrix (unpaired,
adjacent-to-word, escaped) and CJK text.
"""

import pytest

from marqo_tpu.tensor_search.utils import parse_lexical_query

CASES = [
    ("just a string", ([], ["just", "a", "string"])),
    ('just a "string"', (["string"], ["just", "a"])),
    ('just "a" string', (["a"], ["just", "string"])),
    ('"just" a string', (["just"], ["a", "string"])),
    ('just "a long long " string', (["a long long "], ["just", "string"])),
    ('"required 1 " not required " required2" again',
     (["required 1 ", " required2"], ["not", "required", "again"])),
    ('"just" "just" "" a string', (["just", "just"], ["a", "string"])),
    ("朋友你好", ([], ["朋友你好"])),
    ('朋友 "你好"', (["你好"], ["朋友"])),
    ('你好 "老" 朋友', (["老"], ["你好", "朋友"])),
    ('"朋友" 你好', (["朋友"], ["你好"])),
    ("", ([], [])),
    ('"cookie"', (["cookie"], [])),
    ('"朋友"', (["朋友"], [])),
    ('"', ([], [])),
    ('"""hello', ([], ["hello"])),
    ('""" python docstring appeared"""',
     ([], ["python", "docstring", "appeared"])),
    ('""', ([], [])),
    ("what about backticks `?", ([], ["what", "about", "backticks", "`?"])),
    ('\\" escaped quotes\\"  what happens here?',
     ([], ['\\"', "escaped", 'quotes\\"', "what", "happens", "here?"])),
    ('\\"朋友\\"', ([], ['\\"朋友\\"'])),
    ("double  spaces  get  removed",
     ([], ["double", "spaces", "get", "removed"])),
    ('"go"od"', ([], ["go", "od"])),
    ('"ter"m1" term2', ([], ["ter", "m1", "term2"])),
    ('"term1" "term2" "term3', (["term1", "term2"], ["term3"])),
    ('"term1" "term2" "ter"m3', (["term1", "term2"], ["ter", "m3"])),
    ('"term 1" "term "2 "term 3"', (["term 1", "term 3"], ["term", "2"])),
    ('"good', ([], ["good"])),
    ('"朋友', ([], ["朋友"])),
    ('hello "term1" " term 2 " space b"adterm" "badte"rm "term \\"3" '
     '"unfinished',
     (["term1", " term 2 ", 'term \\"3'],
      ["hello", "space", "b", "adterm", "badte", "rm", "unfinished"])),
    ('"go"od" a"', ([], ["go", "od", "a"])),
    ('"sam"a', ([], ["sam", "a"])),
    ('sa"ma" hello!', ([], ["sa", "ma", "hello!"])),
    ('"sam"?', ([], ["sam", "?"])),
    ('"朋友"你好', ([], ["朋友", "你好"])),
]


class TestParseLexicalQuery:
    @pytest.mark.parametrize("text,expected", CASES,
                             ids=[repr(c[0]) for c in CASES])
    def test_parse_lexical_query_goldens(self, text, expected):
        assert parse_lexical_query(text) == expected

    @pytest.mark.parametrize("bad", [124, None, 1.4, False, {}, [1, 2]])
    def test_non_string_raises(self, bad):
        with pytest.raises(TypeError, match="string as input"):
            parse_lexical_query(bad)
