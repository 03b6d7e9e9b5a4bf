"""Cypher subset parser (SURVEY §2.4 G1).

Clean-room implementation of the reference grammar
(/root/reference/cypher.py:120-278, tests /root/reference/cypher_test.py):

    statement := ('match' | 'merge') pattern (',' pattern)*
                 ['optional' 'match' pattern (',' pattern)*]   (extension)
                 ['where' var.attr '=' 'value' ('and' ...)*]   (extension)
                 ['return' (vars | 'count(' var ')')]
    pattern   := node (edge node)*
    node      := '(' [var] [':' Label] [attrs] ')'
    edge      := '-[:REL]->' | '<-[:REL]-'
    attrs     := '{' key ':' 'value' (',' key ':' 'value')* '}'

Keywords are case-insensitive; attribute keys may be bare or quoted
(example.py uses ``{'name': 'Samuel'}``, cypher_test.py ``{title: 'Wall
Street'}``). Output is a list of chains (each chain alternating node/edge
dicts); ``flat`` reproduces the reference's flat ``graph`` list shape for
parity tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOKEN_RE = re.compile(
    r"""
    \s*(
        -\[:(?P<rel_r>\w+)(?:\*(?P<min_r>\d+)\.\.(?P<max_r>\d+))?\]->
        # -[:REL]-> or -[:REL*1..3]->
      | <-\[:(?P<rel_l>\w+)(?:\*(?P<min_l>\d+)\.\.(?P<max_l>\d+))?\]-
        # <-[:REL]- or <-[:REL*1..3]-
      | (?P<punct>[(){},:=])
      | '(?P<squoted>[^']*)'
      | "(?P<dquoted>[^"]*)"
      | (?P<word>[\w.~\[\]#-]+)
    )
    """,
    re.VERBOSE,
)


@dataclass
class Node:
    variable: str | None = None
    label: str | None = None
    attributes: dict[str, str] = field(default_factory=dict)

    @property
    def kind(self) -> str:
        return "match"


@dataclass
class Edge:
    name: str
    direction: str  # 'right' for -[:R]->, 'left' for <-[:R]-
    # Variable-length paths (-[:R*1..3]->): hop-count bounds, both
    # inclusive. (1, 1) is a plain single edge. An extension over the
    # reference grammar, whose '*' token is only the SQL wildcard
    # (/root/reference/cypher.py:41-43).
    min_hops: int = 1
    max_hops: int = 1

    @property
    def kind(self) -> str:
        return "relationship"


class CypherParser:
    """Parses a statement into ``chains`` + ``return_clause``."""

    def __init__(self) -> None:
        self.statement: str | None = None
        self.kind: str | None = None  # 'match' | 'merge'
        self.chains: list[list[Node | Edge]] = []
        self.return_clause: list[str] = []
        # WHERE var.attr = 'value' [and ...] — free-win extension; the
        # reference only supports inline {attr: value} maps.
        self.where_clause: list[tuple[str, str, str]] = []
        # OPTIONAL MATCH chains (left-join extension).
        self.optional_chains: list[list[Node | Edge]] = []
        # RETURN count(var) — aggregate return, also a free win.
        self.return_count: str | None = None

    # -- tokenizer ----------------------------------------------------------

    def _tokenize(self, text: str) -> list[tuple[str, str]]:
        tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                if text[pos:].strip():
                    raise ValueError(f"cypher: cannot tokenize at {text[pos:]!r}")
                break
            if m.group("rel_r"):
                tokens.append(
                    ("edge_r", (m.group("rel_r"), m.group("min_r"), m.group("max_r")))
                )
            elif m.group("rel_l"):
                tokens.append(
                    ("edge_l", (m.group("rel_l"), m.group("min_l"), m.group("max_l")))
                )
            elif m.group("punct"):
                tokens.append(("punct", m.group("punct")))
            elif m.group("squoted") is not None:
                tokens.append(("string", m.group("squoted")))
            elif m.group("dquoted") is not None:
                tokens.append(("string", m.group("dquoted")))
            else:
                tokens.append(("word", m.group("word")))
            pos = m.end()
        return tokens

    # -- parser -------------------------------------------------------------

    def parse(self, statement: str) -> "CypherParser":
        self.statement = statement
        toks = self._tokenize(statement)
        self._toks, self._i = toks, 0

        kw = self._expect("word")[1].lower()
        if kw not in ("match", "merge"):
            raise ValueError(f"cypher: expected match/merge, got {kw!r}")
        self.kind = kw

        self.chains = [self._parse_chain()]
        while self._peek() == ("punct", ","):
            self._next()
            self.chains.append(self._parse_chain())

        # OPTIONAL MATCH <chains> — left-join extension (free win; the
        # reference grammar has no optional patterns).
        if (
            self._peek()
            and self._peek()[0] == "word"
            and self._peek()[1].lower() == "optional"
        ):
            self._next()
            kw2 = self._expect("word")[1].lower()
            if kw2 != "match":
                raise ValueError(f"cypher: expected match after optional, got {kw2!r}")
            if self.kind != "match":
                raise ValueError("cypher: optional match only follows match")
            self.optional_chains = [self._parse_chain()]
            while self._peek() == ("punct", ","):
                self._next()
                self.optional_chains.append(self._parse_chain())

        if self._peek() and self._peek()[0] == "word" and self._peek()[1].lower() == "where":
            self._next()
            while True:
                ref = self._expect("word")[1]
                if "." not in ref:
                    raise ValueError(
                        f"cypher where: expected var.attr, got {ref!r}"
                    )
                self._expect_punct("=")
                val = self._expect("string")[1]
                var, attr = ref.split(".", 1)
                self.where_clause.append((var, attr, val))
                nxt = self._peek()
                if nxt and nxt[0] == "word" and nxt[1].lower() == "and":
                    self._next()
                    continue
                break

        if self._peek() and self._peek()[0] == "word" and self._peek()[1].lower() == "return":
            self._next()
            first = self._expect("word")[1]
            if first.lower() == "count" and self._peek() == ("punct", "("):
                self._next()
                self.return_count = self._expect("word")[1]
                self._expect_punct(")")
            else:
                self.return_clause = [first]
                while self._peek() == ("punct", ","):
                    self._next()
                    self.return_clause.append(self._expect("word")[1])
        if self._peek() is not None:
            raise ValueError(f"cypher: trailing tokens at {self._peek()!r}")
        return self

    def _parse_chain(self) -> list[Node | Edge]:
        chain: list[Node | Edge] = [self._parse_node()]
        while self._peek() and self._peek()[0] in ("edge_r", "edge_l"):
            kind, (rel, lo, hi) = self._next()
            min_hops = int(lo) if lo is not None else 1
            max_hops = int(hi) if hi is not None else 1
            if min_hops < 1 or max_hops < min_hops:
                raise ValueError(
                    f"cypher: bad hop range *{min_hops}..{max_hops}"
                )
            chain.append(
                Edge(
                    name=rel,
                    direction="right" if kind == "edge_r" else "left",
                    min_hops=min_hops,
                    max_hops=max_hops,
                )
            )
            chain.append(self._parse_node())
        return chain

    def _parse_node(self) -> Node:
        self._expect_punct("(")
        node = Node()
        if self._peek() and self._peek()[0] == "word":
            node.variable = self._next()[1]
        if self._peek() == ("punct", ":"):
            self._next()
            node.label = self._expect("word")[1]
        if self._peek() == ("punct", "{"):
            self._next()
            while True:
                key = self._next()
                if key[0] not in ("word", "string"):
                    raise ValueError(f"cypher: bad attr key {key!r}")
                self._expect_punct(":")
                val = self._next()
                if val[0] not in ("word", "string"):
                    raise ValueError(f"cypher: bad attr value {val!r}")
                node.attributes[key[1]] = val[1]
                if self._peek() == ("punct", ","):
                    self._next()
                    continue
                break
            self._expect_punct("}")
        self._expect_punct(")")
        return node

    # -- token helpers ------------------------------------------------------

    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _next(self):
        tok = self._peek()
        if tok is None:
            raise ValueError("cypher: unexpected end of input")
        self._i += 1
        return tok

    def _expect(self, kind: str):
        tok = self._next()
        if tok[0] != kind:
            raise ValueError(f"cypher: expected {kind}, got {tok!r}")
        return tok

    def _expect_punct(self, ch: str):
        tok = self._next()
        if tok != ("punct", ch):
            raise ValueError(f"cypher: expected {ch!r}, got {tok!r}")
        return tok

    # -- reference-shape output ---------------------------------------------

    @property
    def graph(self) -> list[dict]:
        """Flat list in the reference's parse-tree shape
        (/root/reference/cypher_test.py:8-21)."""
        out: list[dict] = []
        for chain in self.chains:
            for item in chain:
                if isinstance(item, Node):
                    d: dict = {"kind": "match", "variable": item.variable}
                    if item.label:
                        d["label"] = item.label
                    if item.attributes:
                        d["attributes"] = dict(item.attributes)
                    out.append(d)
                else:
                    out.append({"kind": "relationship", "name": item.name})
        return out
