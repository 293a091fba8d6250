"""Filter-DSL parser tests — same language spec as the reference's
tests/core/search/test_search_filter.py, rewritten for our parser."""

import pytest

from marqo_tpu.core.exceptions import FilterStringParsingError
from marqo_tpu.core.search.search_filter import (And, EqualityTerm, InTerm,
                                                 MarqoFilterStringParser, Not,
                                                 Or, RangeTerm, SearchFilter)

GOOD_CASES = [
    ("a:b", SearchFilter(EqualityTerm("a", "b", "a:b"))),
    ("(a:b)", SearchFilter(EqualityTerm("a", "b", "a:b"))),
    ("(NOT a:b)", SearchFilter(Not(EqualityTerm("a", "b", "a:b")))),
    ("(((a:n)))", SearchFilter(EqualityTerm("a", "n", "a:n"))),
    ("NOT a:1 AND b:2 OR NOT c:3",
     SearchFilter(Or(And(Not(EqualityTerm("a", "1", "a:1")),
                         EqualityTerm("b", "2", "b:2")),
                     Not(EqualityTerm("c", "3", "c:3"))))),
    ("(((a:1 AND NOT b:2)) OR (NOT c:3))",
     SearchFilter(Or(And(EqualityTerm("a", "1", "a:1"),
                         Not(EqualityTerm("b", "2", "b:2"))),
                     Not(EqualityTerm("c", "3", "c:3"))))),
    ("a:1 AND (b:2 OR c:3)",
     SearchFilter(And(EqualityTerm("a", "1", "a:1"),
                      Or(EqualityTerm("b", "2", "b:2"),
                         EqualityTerm("c", "3", "c:3"))))),
    ("a:1 AND NOT (b:2 OR c:3)",
     SearchFilter(And(EqualityTerm("a", "1", "a:1"),
                      Not(Or(EqualityTerm("b", "2", "b:2"),
                             EqualityTerm("c", "3", "c:3")))))),
    ("a:1 AND (b:2 OR (c:3 AND (d:4 OR e:5))) OR d:6",
     SearchFilter(Or(And(EqualityTerm("a", "1", "a:1"),
                         Or(EqualityTerm("b", "2", "b:2"),
                            And(EqualityTerm("c", "3", "c:3"),
                                Or(EqualityTerm("d", "4", "d:4"),
                                   EqualityTerm("e", "5", "e:5"))))),
                     EqualityTerm("d", "6", "d:6")))),
    ("My\\ Field\\-:(How's it going?)",
     SearchFilter(EqualityTerm("My Field-", "How's it going?",
                               "My\\ Field\\-:(How's it going?)"))),
    ("a:(hello world)",
     SearchFilter(EqualityTerm("a", "hello world", "a:(hello world)"))),
    ("a:(1, 2, 3)",
     SearchFilter(EqualityTerm("a", "1, 2, 3", "a:(1, 2, 3)"))),
    ("a IN (1, 2, 3)", SearchFilter(InTerm("a", ["1", "2", "3"], "a IN (1,2,3)"))),
    ("a in (1, 2, 3)", SearchFilter(InTerm("a", ["1", "2", "3"], "a IN (1,2,3)"))),
    ("a in (1,    2,         3)",
     SearchFilter(InTerm("a", ["1", "2", "3"], "a IN (1,2,3)"))),
    ("a IN (hello,goodbye)",
     SearchFilter(InTerm("a", ["hello", "goodbye"], "a IN (hello,goodbye)"))),
    ("a IN (1, 2, 3) AND b:2",
     SearchFilter(And(InTerm("a", ["1", "2", "3"], "a IN (1,2,3)"),
                      EqualityTerm("b", "2", "b:2")))),
    ("a IN (1, 2, 3) OR b:2",
     SearchFilter(Or(InTerm("a", ["1", "2", "3"], "a IN (1,2,3)"),
                     EqualityTerm("b", "2", "b:2")))),
    ("NOT a IN (1, 2, 3)",
     SearchFilter(Not(InTerm("a", ["1", "2", "3"], "a IN (1,2,3)")))),
    ("a IN ((value 1), 2, (value 3))",
     SearchFilter(InTerm("a", ["value 1", "2", "value 3"],
                         "a IN ((value 1),2,(value 3))"))),
    ("a IN (hi)", SearchFilter(InTerm("a", ["hi"], "a IN (hi)"))),
    ("a IN (1, (value 2), 3) AND NOT b IN (4, (value 5), (value 6))",
     SearchFilter(And(InTerm("a", ["1", "value 2", "3"], "a IN (1,(value 2),3)"),
                      Not(InTerm("b", ["4", "value 5", "value 6"],
                                 "b IN (4,(value 5),(value 6))"))))),
    ("a:(value 1) OR (b IN ((2)) AND c:3)",
     SearchFilter(Or(EqualityTerm("a", "value 1", "a:(value 1)"),
                     And(InTerm("b", ["2"], "b IN ((2))"),
                         EqualityTerm("c", "3", "c:3"))))),
    ("a IN (1, 2,, 3)",
     SearchFilter(InTerm("a", ["1", "2", "", "3"], "a IN (1,2,,3)"))),
    ("text_field_2 IN ((some text), (something else))",
     SearchFilter(InTerm("text_field_2", ["some text", "something else"],
                         "text_field_2 IN ((some text),(something else))"))),
    ("(float_field_1:[0 TO 1]) AND (text_field_1 in ((some text)))",
     SearchFilter(And(RangeTerm("float_field_1", 0, 1, "float_field_1:[0 TO 1]"),
                      InTerm("text_field_1", ["some text"],
                             "text_field_1 IN ((some text))")))),
    ("((float_field_1:[0 TO 1])) AND ((text_field_1 in ((some text)) OR "
     "text_field_2 IN (1,2,3)))",
     SearchFilter(And(RangeTerm("float_field_1", 0, 1, "float_field_1:[0 TO 1]"),
                      Or(InTerm("text_field_1", ["some text"],
                                "text_field_1 IN ((some text))"),
                         InTerm("text_field_2", ["1", "2", "3"],
                                "text_field_2 IN (1,2,3)"))))),
    ("(a:1 AND NOT (b:[1 TO 10] OR (c IN (x, y, (hello world)))))",
     SearchFilter(And(EqualityTerm("a", "1", "a:1"),
                      Not(Or(RangeTerm("b", 1, 10, "b:[1 TO 10]"),
                             InTerm("c", ["x", "y", "hello world"],
                                    "c IN (x,y,(hello world))")))))),
    # ranges with wildcard + floats
    ("price:[* TO 99.5]", SearchFilter(RangeTerm("price", None, 99.5,
                                                 "price:[* TO 99.5]"))),
    ("price:[10 TO *]", SearchFilter(RangeTerm("price", 10, None,
                                               "price:[10 TO *]"))),
]

BAD_CASES = [
    ("AND a:1 OR b:2", "Unexpected AND"),
    ("a:(b))", "Unexpected )"),
    ("a:1 AND b:2 (OR c:3)", "Unexpected OR"),
    ("a:1 AND b:2 OR", "but found OR"),
    ("a:1 AND (b:2 OR c:3 AND) OR e:5", "but found AND"),
    ("a:1 AND b:2 OR OR c:3", "found OR"),
    ("a:1 AND b:2 OR NOT OR c:3", "found OR"),
    ("a:1 AND b:2 OR NOT", "but found NOT"),
    ("a:1 AND (b:2 OR c:3 NOT) OR e:5", "Unexpected modifier 'NOT'"),
    ("a:1 AND b:2 OR NOT NOT c:3", "Unexpected modifier 'NOT'"),
    ("a:1 NOT a:1", "Unexpected modifier 'NOT'"),
    ("a:1 a:1", "Expected an operator"),
    ("(a:1 AND b:2) b:2", "Expected an operator"),
    ("(a:1 AND b:2)(c:3 AND d:4)", "Unexpected expression ending"),
    ("a:1 (c:3 AND d:4)", "Unexpected expression ending"),
    ("a:1 AND b:2)", "Unexpected )"),
    ("(a:1 AND b:2", "Unbalanced parentheses"),
    ("", "empty filter string"),
    (" ", "Empty filter string"),
    ("   ", "Empty filter string"),
    ("(", "Unbalanced parentheses"),
    (")", "Unexpected )"),
    ("()", "Empty expression"),
    ("a:1 AND (b:2 OR (c:3 AND (d:4 OR e:5)) OR d:6", "Unbalanced parentheses"),
    ("a:1 AND b:2 OR (c:3 AND (d:4 OR e:5))) OR d:6", "Unexpected )"),
    ("a IN (1, 2 OR 3)", "Unexpected white space"),
    ("a IN (1, 2 AND 3)", "Unexpected white space"),
    ("a IN (1, 2 NOT 3)", "Unexpected white space"),
    ("a IN (1, 2, 3, [0 TO 1])", "Unexpected [ after IN operator"),
    ("a IN (1, 2, 3))", "Unexpected )"),
    ("a IN (val1, val 2, val3)", "Unexpected white space"),
    ("a IN 1, 2, 3)", "Expected ("),
]


class TestParseSuccessful:
    @pytest.mark.parametrize("filter_string,expected",
                             GOOD_CASES, ids=[c[0] for c in GOOD_CASES])
    def test_parse(self, filter_string, expected):
        parsed = MarqoFilterStringParser().parse(filter_string)
        assert parsed == expected


class TestParseMalformed:
    @pytest.mark.parametrize("filter_string,fragment",
                             BAD_CASES, ids=[repr(c[0]) for c in BAD_CASES])
    def test_malformed(self, filter_string, fragment):
        with pytest.raises(FilterStringParsingError) as exc_info:
            MarqoFilterStringParser().parse(filter_string)
        assert fragment in str(exc_info.value)


class TestNodeEquality:
    def test_tree_equality(self):
        t1 = Or(And(EqualityTerm("a", "1", "a:1"), EqualityTerm("b", "2", "b:2")),
                EqualityTerm("c", "3", "c:3"))
        t2 = Or(And(EqualityTerm("b", "2", "b:2"), EqualityTerm("a", "1", "a:1")),
                EqualityTerm("c", "3", "c:3"))
        t3 = And(Or(EqualityTerm("a", "1", "a:1"), EqualityTerm("b", "2", "b:2")),
                 EqualityTerm("c", "3", "c:3"))
        assert t1 == t1
        assert t1 != t2
        assert t1 != t3

    def test_precedence_and_binds_tighter(self):
        parsed = MarqoFilterStringParser().parse("a:1 OR b:2 AND c:3")
        expected = Or(EqualityTerm("a", "1", "a:1"),
                      And(EqualityTerm("b", "2", "b:2"),
                          EqualityTerm("c", "3", "c:3")))
        assert parsed.root == expected


class TestRoundTrip:
    """Property test: str(SearchFilter) must re-parse to an equal tree
    (the remote engine ships filters as strings — engine/client.py)."""

    def _random_tree(self, rng, depth=0):
        import random
        choice = rng.choice(["eq", "range", "in", "and", "or", "not"]
                            if depth < 3 else ["eq", "range", "in"])
        if choice == "eq":
            field = rng.choice(["alpha", "beta_2", "G_amma"])
            value = rng.choice(["v1", "42", "x_y"])
            return EqualityTerm(field, value, f"{field}:{value}")
        if choice == "range":
            lo, hi = sorted(rng.choice(range(100), size=2, replace=False))
            field = rng.choice(["price", "count"])
            return RangeTerm(field, int(lo), int(hi),
                             f"{field}:[{lo} TO {hi}]")
        if choice == "in":
            field = rng.choice(["tag", "cat"])
            values = [rng.choice(["a", "b9", "zz"])
                      for _ in range(rng.integers(1, 4))]
            raw = f"{field} IN ({','.join(values)})"
            return InTerm(field, values, raw)
        left = self._random_tree(rng, depth + 1)
        right = self._random_tree(rng, depth + 1)
        if choice == "and":
            return And(left, right)
        if choice == "or":
            return Or(left, right)
        # NOT NOT is not expressible in the grammar (reference rejects it
        # too) — the parser can never produce it, so don't generate it
        while isinstance(left, Not):
            left = left.modified
        return Not(left)

    def test_random_roundtrips(self):
        import numpy as np
        rng = np.random.default_rng(7)
        parser = MarqoFilterStringParser()
        for _ in range(200):
            tree = self._random_tree(rng)
            rendered = str(SearchFilter(tree))
            reparsed = parser.parse(rendered)
            assert reparsed.root == tree, rendered

    def test_engine_wire_format(self):
        """The exact strings the remote client sends must re-parse."""
        cases = [
            "a:b AND (c:[1 TO 5] OR NOT tag IN (x,(y z)))",
            "My\\ Field:(hello there) AND _id:doc1",
            "NOT (a:1 OR b:2) AND c:3",
        ]
        parser = MarqoFilterStringParser()
        for case in cases:
            once = parser.parse(case)
            twice = parser.parse(str(once))
            assert once == twice, case
