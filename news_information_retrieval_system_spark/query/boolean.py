"""Boolean query engine: parse once on the driver, execute as joins.

Grammar (reference src/ir/retrieval/boolean.py:132-520 + the cleaner AST
pair src/ir/query/query_parser.py:79-506 / query_executor.py:93-278):

    expr     := or
    or       := and (OR and)*
    and      := unary ((AND | NEAR/n) unary)*     # bare adjacency = AND
    unary    := NOT unary | atom
    atom     := '(' expr ')' | '"phrase"' | field:value | field:[a TO b]
                | wildcard-term (*, ?) | term

Precedence NOT > AND/NEAR > OR, matching the reference's shunting-yard
table (boolean.py:303-378). The reference evaluates over Python doc-id
sets; we compile the AST to a tree of DataFrame set ops:

    term        → postings semi-filter               (Q1)
    AND         → inner join on doc_id               (Q2, boolean.py:331-373)
    OR          → union + distinct                   (Q3, :375-420)
    NOT         → universe left_anti hits            (Q4, :422-449)
    field:value → metadata column filter (pushdown)  (Q11)
    field:[a TO b] → between filter                  (Q12, lexicographic)
    wildcard    → vocabulary rlike scan, cap 50      (Q9, wildcard.py:59-201)
    "phrase"    → positional adjacency join          (Q6)
    NEAR/n      → positional distance join; degrades to AND unless both
                  operands are plain terms (boolean.py:650-708)

Catalyst then does what the reference's unused ``optimize`` flag only
planned (boolean.py:142-148): join reordering, broadcast selection,
predicate pushdown to the scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .phrase import phrase_match, proximity_match

MAX_WILDCARD_EXPANSIONS = 50  # reference wildcard.py cap


# ---------------------------------------------------------------- parsing
@dataclass
class Node:
    kind: str  # term|and|or|not|near|phrase|field|range|wildcard
    term: str = ""
    field: str = ""
    value: str = ""
    lo: str = ""
    hi: str = ""
    dist: int = 0
    terms: List[str] = dc_field(default_factory=list)
    children: List["Node"] = dc_field(default_factory=list)


_TOKEN_RE = re.compile(
    r"""\(|\)|"[^"]*"|\bAND\b|\bOR\b|\bNOT\b|NEAR/\d+|[^\s()"]+""",
)


class BooleanParser:
    """Recursive-descent parser with the reference's precedence."""

    def parse(self, query: str) -> Node:
        self.toks = _TOKEN_RE.findall(query)
        self.i = 0
        node = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens in query: {self.toks[self.i:]}")
        return node

    def _peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _or(self) -> Node:
        left = self._and()
        while self._peek() == "OR":
            self._next()
            left = Node("or", children=[left, self._and()])
        return left

    def _and(self) -> Node:
        left = self._unary()
        while True:
            p = self._peek()
            if p == "AND":
                self._next()
                left = Node("and", children=[left, self._unary()])
            elif p is not None and p.startswith("NEAR/"):
                dist = int(self._next().split("/")[1])
                left = Node("near", dist=dist, children=[left, self._unary()])
            elif p is not None and p not in (")", "OR"):
                # bare adjacency = implicit AND (reference default operator)
                left = Node("and", children=[left, self._unary()])
            else:
                return left

    def _unary(self) -> Node:
        if self._peek() == "NOT":
            self._next()
            return Node("not", children=[self._unary()])
        return self._atom()

    def _atom(self) -> Node:
        t = self._next()
        if t == "(":
            node = self._or()
            if self._next() != ")":
                raise ValueError("unbalanced parens")
            return node
        if t.startswith('"'):
            return Node("phrase", terms=t.strip('"').lower().split())
        if ":" in t and not t.startswith(":"):
            fld, val = t.split(":", 1)
            if val == "" and (self._peek() or "").startswith('"'):
                # field:"multi word" — the tokenizer splits at the quote, so
                # the quoted phrase arrives as the next token. Reference
                # semantics: AND of the phrase tokens within the field
                # (src/ir/retrieval/boolean.py:603-628).
                phrase = self._next().strip('"').lower().split()
                return Node("fieldphrase", field=fld, terms=phrase)
            if val.startswith("["):
                # field:[a TO b] — may span tokens if values had spaces; our
                # grammar requires bracket syntax without internal spaces
                # except the TO: re-join until closing bracket
                while not val.endswith("]") and self._peek() is not None:
                    val += " " + self._next()
                m = re.match(r"\[(.+?)\s+TO\s+(.+?)\]", val)
                if not m:
                    raise ValueError(f"bad range syntax: {val}")
                return Node("range", field=fld, lo=m.group(1), hi=m.group(2))
            return Node("field", field=fld, value=val)
        if "*" in t or "?" in t:
            return Node("wildcard", term=t.lower())
        return Node("term", term=t.lower())


# ------------------------------------------------------------- execution
def _glob_to_regex(pattern: str) -> str:
    return "^" + re.escape(pattern).replace(r"\*", ".*").replace(r"\?", ".") + "$"


class BooleanEngine:
    """Compiles a parsed query to a DataFrame of matching doc_ids."""

    def __init__(self, index: FulltextIndex, positional: DataFrame | None = None):
        self.index = index
        self.positional = positional
        self.parser = BooleanParser()

    def query(self, q: str, rank: bool = False) -> DataFrame:
        """→ (doc_id) or, with rank=True, (doc_id, score=Σ tf over the
        query's plain terms — reference boolean.py:751-789)."""
        ast = self.parser.parse(q)
        hits = self._eval(ast)
        if not rank:
            return hits
        terms = self._collect_terms(ast)
        tf = (
            self.index.postings.filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.sum("tf").cast("long").alias("score"))
        )
        return hits.join(tf, "doc_id", "left").fillna({"score": 0})

    def _collect_terms(self, node: Node) -> List[str]:
        out = []
        if node.kind == "term":
            out.append(node.term)
        out.extend(node.terms)
        for c in node.children:
            out.extend(self._collect_terms(c))
        return out

    def _universe(self) -> DataFrame:
        return self.index.docs.select("doc_id")

    def _term_docs(self, term: str) -> DataFrame:
        return self.index.postings.filter(F.col("term") == term).select("doc_id")

    def _eval(self, node: Node) -> DataFrame:
        k = node.kind
        if k == "term":
            return self._term_docs(node.term)
        if k == "and":
            l, r = (self._eval(c) for c in node.children)
            return l.join(r, "doc_id", "inner").select("doc_id")
        if k == "or":
            l, r = (self._eval(c) for c in node.children)
            return l.unionByName(r).distinct()
        if k == "not":
            return self._universe().join(
                self._eval(node.children[0]), "doc_id", "left_anti"
            )
        if k == "near":
            a, b = node.children
            if a.kind == "term" and b.kind == "term" and self.positional is not None:
                return proximity_match(self.positional, a.term, b.term, node.dist)
            # degrade to AND (reference boolean.py:650-708)
            return self._eval(Node("and", children=[a, b]))
        if k == "phrase":
            if self.positional is None:
                raise ValueError("phrase query requires a positional index")
            return phrase_match(self.positional, node.terms).select("doc_id")
        if k == "field":
            col = F.col(node.field)
            docs = self.index.docs
            if dict(docs.dtypes).get(node.field, "").startswith("array"):
                return docs.filter(F.array_contains(col, node.value)).select("doc_id")
            return docs.filter(col.cast("string") == node.value).select("doc_id")
        if k == "fieldphrase":
            # AND of the phrase tokens within the named field — a tokenized
            # membership test on the doc column; Catalyst pushes it to the
            # scan as a plain predicate (no postings needed)
            from ..tokenize import tokens_col

            docs = self.index.docs
            toks = tokens_col(F.col(node.field).cast("string"))
            cond = F.lit(True)
            for term in node.terms:
                cond = cond & F.array_contains(toks, term)
            return docs.filter(cond).select("doc_id")
        if k == "range":
            return self.index.docs.filter(
                F.col(node.field).cast("string").between(node.lo, node.hi)
            ).select("doc_id")
        if k == "wildcard":
            rx = _glob_to_regex(node.term)
            terms = (
                self.index.term_stats.filter(F.col("term").rlike(rx))
                .orderBy("term")
                .limit(MAX_WILDCARD_EXPANSIONS)
                .select("term")
            )
            return (
                self.index.postings.join(F.broadcast(terms), "term")
                .select("doc_id")
                .distinct()
            )
        raise ValueError(f"unknown node kind {k}")
