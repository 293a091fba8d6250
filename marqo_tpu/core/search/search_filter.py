"""Marqo filter-DSL parser.

Behavior parity: reference src/marqo/core/search/search_filter.py
(:9-205 node classes, :284-463 parser) and its test suite
(tests/core/search/test_search_filter.py) — the full grammar:

    expr     := or
    or       := and (OR and)*
    and      := unary (AND unary)*
    unary    := NOT unary | '(' expr ')' | term
    term     := field ':' value
              | field ':' '(' grouped value ')'     (spaces allowed)
              | field ':' '[' lower TO upper ']'    (range, '*' = unbounded)
              | field IN '(' v1, (grouped v2), … ')'

Escaping with backslash in fields and bare values. AND binds tighter than
OR; NOT is unary. Implemented as a context-sensitive lexer (grouped values
and ranges are single tokens) + precedence-climbing parser — a new design,
same language.
"""

from typing import List, Optional, Union

from marqo_tpu.core.exceptions import FilterStringParsingError


# --- AST ------------------------------------------------------------------

class Node:
    pass


class Term(Node):
    def __init__(self, field: str, raw: str):
        self.field = field
        self.raw = raw

    def __str__(self):
        return self.raw


class EqualityTerm(Term):
    def __init__(self, field: str, value: str, raw: str):
        super().__init__(field, raw)
        self.value = value

    def __eq__(self, other):
        return (type(self) == type(other) and self.field == other.field
                and self.value == other.value and self.raw == other.raw)

    def __hash__(self):
        return hash((self.field, self.value, self.raw))

    def __repr__(self):
        return f"EqualityTerm({self.field!r}, {self.value!r}, {self.raw!r})"


class RangeTerm(Term):
    def __init__(self, field: str, lower: Optional[Union[int, float]],
                 upper: Optional[Union[int, float]], raw: str):
        super().__init__(field, raw)
        if lower is None and upper is None:
            raise ValueError("At least one of lower or upper must be specified")
        self.lower = lower
        self.upper = upper

    @classmethod
    def parse(cls, field: str, value: str, raw: str) -> "RangeTerm":
        parts = value.lower().split(" to ")
        if len(parts) != 2:
            raise ValueError(f"Cannot parse range '{value}'")
        lower_str, upper_str = parts

        def parse_limit(limit: str):
            try:
                return int(limit)
            except ValueError:
                try:
                    return float(limit)
                except ValueError:
                    raise ValueError(f"Invalid range limit '{limit}'")

        lower = None if lower_str.strip() == "*" else parse_limit(lower_str.strip())
        upper = None if upper_str.strip() == "*" else parse_limit(upper_str.strip())
        return cls(field, lower, upper, raw)

    def __eq__(self, other):
        return (type(self) == type(other) and self.field == other.field
                and self.lower == other.lower and self.upper == other.upper
                and self.raw == other.raw)

    def __hash__(self):
        return hash((self.field, self.lower, self.upper, self.raw))

    def __repr__(self):
        return (f"RangeTerm({self.field!r}, {self.lower!r}, {self.upper!r}, "
                f"{self.raw!r})")


class InTerm(Term):
    def __init__(self, field: str, value_list: List[str], raw: str):
        super().__init__(field, raw)
        self.value_list = value_list

    def __eq__(self, other):
        return (type(self) == type(other) and self.field == other.field
                and set(self.value_list) == set(other.value_list)
                and self.raw == other.raw)

    def __hash__(self):
        return hash((self.field, frozenset(self.value_list), self.raw))

    def __repr__(self):
        return f"InTerm({self.field!r}, {self.value_list!r}, {self.raw!r})"


class Operator(Node):
    name = "?"

    def __init__(self, left: Node, right: Node, raw: str = None):
        self.left = left
        self.right = right
        self.raw = raw or self.name

    def __eq__(self, other):
        return (type(self) == type(other) and self.left == other.left
                and self.right == other.right)

    def __str__(self):
        return f"({self.left} {self.name} {self.right})"

    def __repr__(self):
        return f"{self.__class__.__name__}({self.left!r}, {self.right!r})"


class And(Operator):
    name = "AND"


class Or(Operator):
    name = "OR"


class Not(Node):
    def __init__(self, modified: Node, raw: str = "NOT"):
        self.modified = modified
        self.raw = raw

    def __eq__(self, other):
        return type(self) == type(other) and self.modified == other.modified

    def __str__(self):
        return f"NOT {self.modified}"

    def __repr__(self):
        return f"Not({self.modified!r})"


class SearchFilter:
    """A parsed filter as a Node tree."""

    def __init__(self, root: Node):
        self.root = root

    def __eq__(self, other):
        return type(self) == type(other) and self.root == other.root

    def __str__(self):
        if self.root is None:
            return ""
        s = str(self.root)
        if s.startswith("(") and s.endswith(")"):
            return s[1:-1]
        return s

    def __repr__(self):
        return f"SearchFilter({self.root!r})"


# --- lexer ------------------------------------------------------------------

class _Tok:
    TERM = "TERM"
    AND = "AND"
    OR = "OR"
    NOT = "NOT"
    LPAREN = "("
    RPAREN = ")"

    def __init__(self, kind: str, node: Optional[Term] = None, pos: int = 0):
        self.kind = kind
        self.node = node
        self.pos = pos

    def __repr__(self):
        return f"Tok({self.kind}, {self.node!r})"


class MarqoFilterStringParser:
    """Parses a Marqo filter string into a SearchFilter."""

    def parse(self, filter_string: str) -> SearchFilter:
        if filter_string is None or filter_string == "":
            raise FilterStringParsingError("Cannot parse empty filter string")
        if filter_string.strip() == "":
            raise FilterStringParsingError("Empty filter string")
        self._s = filter_string
        self._n = len(filter_string)
        self._i = 0
        tokens = self._lex()
        root, idx = self._parse_or(tokens, 0, depth=0)
        if idx != len(tokens):
            tok = tokens[idx]
            if tok.kind == _Tok.RPAREN:
                self._error(f"Unexpected ) at position {tok.pos}")
            self._error(f"Unexpected token at position {tok.pos}")
        return SearchFilter(root)

    # -- errors --

    def _error(self, message: str):
        raise FilterStringParsingError(
            f"Error parsing filter '{self._s}': {message}")

    # -- lexing --

    def _skip_ws(self):
        while self._i < self._n and self._s[self._i].isspace():
            self._i += 1

    def _lex(self) -> List["_Tok"]:
        tokens: List[_Tok] = []
        while True:
            self._skip_ws()
            if self._i >= self._n:
                break
            start = self._i
            ch = self._s[self._i]
            if ch == "(":
                self._i += 1
                tokens.append(_Tok(_Tok.LPAREN, pos=start))
                continue
            if ch == ")":
                self._i += 1
                tokens.append(_Tok(_Tok.RPAREN, pos=start))
                continue
            word, has_colon = self._read_word()
            if has_colon:
                tokens.append(_Tok(_Tok.TERM, self._finish_colon_term(word, start),
                                   pos=start))
            elif word == "AND":
                tokens.append(_Tok(_Tok.AND, pos=start))
            elif word == "OR":
                tokens.append(_Tok(_Tok.OR, pos=start))
            elif word == "NOT":
                tokens.append(_Tok(_Tok.NOT, pos=start))
            elif self._peek_in():
                tokens.append(_Tok(_Tok.TERM, self._finish_in_term(word, start),
                                   pos=start))
            else:
                # a bare word that is not a term — treat as a field with no
                # value, which is malformed
                self._error(f"Unexpected token '{word}' at position {start}. "
                            f"Expected a term like field:value")
        return tokens

    def _read_word(self):
        """Read a bare word up to whitespace/paren, honoring escapes.
        Returns (unescaped_prefix_up_to_colon_or_word, saw_unescaped_colon).
        Stops right AFTER an unescaped ':' if one is found."""
        out = []
        while self._i < self._n:
            c = self._s[self._i]
            if c == "\\" and self._i + 1 < self._n:
                out.append(self._s[self._i + 1])
                self._i += 2
                continue
            if c == ":":
                self._i += 1
                return "".join(out), True
            if c.isspace() or c in "()":
                break
            out.append(c)
            self._i += 1
        return "".join(out), False

    def _peek_in(self) -> bool:
        """After a bare field word: is the next token the IN operator?"""
        save = self._i
        self._skip_ws()
        if (self._i + 2 <= self._n and self._s[self._i:self._i + 2].upper() == "IN"
                and (self._i + 2 == self._n or not self._s[self._i + 2].isalnum())):
            return True  # leave cursor after whitespace; _finish_in_term continues
        self._i = save
        return False

    def _finish_colon_term(self, field: str, start: int) -> Term:
        """Cursor is just past 'field:'. Parse the value."""
        if self._i >= self._n:
            return EqualityTerm(field, "", self._s[start:self._i])
        c = self._s[self._i]
        if c == "(":
            value = self._read_group()
            return EqualityTerm(field, value, self._s[start:self._i])
        if c == "[":
            bracket_start = self._i
            end = self._s.find("]", self._i)
            if end == -1:
                self._error(f"Unbalanced brackets in range term at position "
                            f"{bracket_start}")
            inner = self._s[self._i + 1:end]
            self._i = end + 1
            raw = self._s[start:self._i]
            try:
                return RangeTerm.parse(field, inner, raw)
            except ValueError as e:
                self._error(f"Cannot parse range term '{raw}': {e}")
        # bare value
        out = []
        while self._i < self._n:
            c = self._s[self._i]
            if c == "\\" and self._i + 1 < self._n:
                out.append(self._s[self._i + 1])
                self._i += 2
                continue
            if c.isspace() or c in "()":
                break
            out.append(c)
            self._i += 1
        return EqualityTerm(field, "".join(out), self._s[start:self._i])

    def _read_group(self) -> str:
        """Cursor at '('. Read a parenthesized free-text value (one level of
        nesting allowed inside); returns the inner text."""
        depth = 0
        out = []
        while self._i < self._n:
            c = self._s[self._i]
            if c == "(":
                depth += 1
                if depth > 1:
                    out.append(c)
            elif c == ")":
                depth -= 1
                if depth == 0:
                    self._i += 1
                    return "".join(out)
                out.append(c)
            else:
                out.append(c)
            self._i += 1
        self._error("Unbalanced parentheses in grouped value")

    def _finish_in_term(self, field: str, start: int) -> Term:
        """Cursor at the 'IN' keyword (whitespace already skipped)."""
        self._i += 2  # consume IN
        self._skip_ws()
        if self._i >= self._n or self._s[self._i] != "(":
            self._error(f"Expected ( after IN operator at position {self._i}")
        self._i += 1  # consume (
        values: List[str] = []
        grouped_flags: List[bool] = []
        current: List[str] = []
        grouped_value: Optional[str] = None

        def push():
            nonlocal grouped_value
            if grouped_value is not None:
                values.append(grouped_value)
                grouped_flags.append(True)
                grouped_value = None
            else:
                values.append("".join(current).strip())
                grouped_flags.append(False)
            current.clear()

        while True:
            if self._i >= self._n:
                self._error("Unbalanced parentheses in IN term")
            c = self._s[self._i]
            if c == "[":
                self._error(f"Unexpected [ after IN operator at position {self._i}")
            if c == "(":
                if "".join(current).strip():
                    self._error(f"Unexpected ( inside IN list at position {self._i}")
                grouped_value = self._read_group()
                continue
            if c == ")":
                self._i += 1
                push()
                break
            if c == ",":
                push()
                self._i += 1
                continue
            if c.isspace():
                # whitespace only allowed around commas / after groups
                j = self._i
                while j < self._n and self._s[j].isspace():
                    j += 1
                nxt = self._s[j] if j < self._n else ""
                if ("".join(current).strip() or grouped_value is not None) and \
                        nxt not in (",", ")"):
                    self._error(f"Unexpected white space in IN term at "
                                f"position {self._i}")
                self._i = j
                continue
            if grouped_value is not None:
                self._error(f"Unexpected character after grouped IN value at "
                            f"position {self._i}")
            if c == "\\" and self._i + 1 < self._n:
                current.append(self._s[self._i + 1])
                self._i += 2
                continue
            current.append(c)
            self._i += 1

        canonical = ",".join(
            f"({v})" if grouped else v
            for v, grouped in zip(values, grouped_flags))
        raw = f"{field} IN ({canonical})"
        return InTerm(field, values, raw)

    # -- parsing (precedence climbing) --

    def _parse_or(self, tokens, idx, depth):
        node, idx = self._parse_and(tokens, idx, depth)
        while idx < len(tokens) and tokens[idx].kind == _Tok.OR:
            op_pos = tokens[idx].pos
            idx += 1
            if idx >= len(tokens):
                self._error(f"Expected a term or expression after OR at "
                            f"position {op_pos}, but found OR at end of string")
            right, idx = self._parse_and(tokens, idx, depth)
            node = Or(node, right)
        return node, idx

    def _parse_and(self, tokens, idx, depth):
        node, idx = self._parse_unary(tokens, idx, depth)
        while idx < len(tokens) and tokens[idx].kind == _Tok.AND:
            op_pos = tokens[idx].pos
            idx += 1
            if idx >= len(tokens):
                self._error(f"Expected a term or expression after AND at "
                            f"position {op_pos}, but found AND at end of string")
            if tokens[idx].kind == _Tok.RPAREN:
                self._error(f"Expected a term or expression after AND at "
                            f"position {op_pos}, but found AND dangling "
                            f"before )")
            right, idx = self._parse_unary(tokens, idx, depth)
            node = And(node, right)
        # detect term-after-term / expression-after-expression
        if idx < len(tokens) and tokens[idx].kind in (_Tok.TERM, _Tok.LPAREN,
                                                      _Tok.NOT):
            tok = tokens[idx]
            if tok.kind == _Tok.TERM:
                self._error(f"Expected an operator at position {tok.pos}, "
                            f"found a term")
            if tok.kind == _Tok.LPAREN:
                # mirror the reference's single-pass behavior: if the
                # expression that follows starts with an operator, report
                # that operator
                if idx + 1 < len(tokens) and tokens[idx + 1].kind in (
                        _Tok.AND, _Tok.OR):
                    self._error(f"Unexpected {tokens[idx + 1].kind} at "
                                f"position {tokens[idx + 1].pos}")
                self._error(f"Unexpected expression ending — expected an "
                            f"operator before position {tok.pos}")
            self._error(f"Unexpected modifier 'NOT' at position {tok.pos}")
        return node, idx

    def _parse_unary(self, tokens, idx, depth):
        if idx >= len(tokens):
            self._error("Unexpected end of filter string; expected a term, "
                        "but found nothing (Unbalanced parentheses?)")
        tok = tokens[idx]
        if tok.kind == _Tok.NOT:
            if idx + 1 >= len(tokens):
                self._error(f"Expected a term or expression after modifier at "
                            f"position {tok.pos}, but found NOT at end of string")
            nxt = tokens[idx + 1]
            if nxt.kind in (_Tok.AND, _Tok.OR):
                self._error(f"Expected a term or expression after NOT, but "
                            f"found {nxt.kind}")
            if nxt.kind == _Tok.NOT:
                self._error(f"Unexpected modifier 'NOT' at position {nxt.pos}")
            inner, idx = self._parse_unary(tokens, idx + 1, depth)
            return Not(inner), idx
        if tok.kind == _Tok.LPAREN:
            if idx + 1 < len(tokens) and tokens[idx + 1].kind == _Tok.RPAREN:
                self._error(f"Empty expression at position {tok.pos}")
            node, idx = self._parse_or(tokens, idx + 1, depth + 1)
            if idx >= len(tokens):
                self._error("Unbalanced parentheses: expression not closed")
            if tokens[idx].kind != _Tok.RPAREN:
                t = tokens[idx]
                self._error(f"Expected ) at position {t.pos}")
            return node, idx + 1
        if tok.kind == _Tok.TERM:
            return tok.node, idx + 1
        if tok.kind == _Tok.RPAREN:
            self._error(f"Unexpected ) at position {tok.pos}")
        # an operator where a term was expected: at the start of an
        # expression it is "Unexpected"; after another operator it dangles
        if idx == 0 or tokens[idx - 1].kind == _Tok.LPAREN:
            self._error(f"Unexpected {tok.kind} at position {tok.pos}")
        self._error(f"Expected a term, expression or modifier at position "
                    f"{tok.pos}, but found {tok.kind}")
