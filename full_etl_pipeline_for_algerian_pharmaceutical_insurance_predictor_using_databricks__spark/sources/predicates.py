"""Predicate analysis for row-level DML file pruning (r15).

The SQL dispatcher (`lakesql`) and the protocol tiers accept arbitrary
Catalyst-parseable WHERE predicates for DELETE / UPDATE.  Row-level
truth is ALWAYS Catalyst's (`F.expr(text)`) — this module never
evaluates a predicate against a row.  What it does is the metadata
half: parse the text into a small boolean AST and decide, from a
file's column statistics (min / max / null counts), whether the file
MAY contain a row satisfying the predicate.  The answer is a sound
over-approximation — `True` ("touched") whenever the statistics cannot
PROVE the file disjoint — so pruning can only skip provably-unaffected
files, exactly the data-skipping contract Delta stats / Iceberg
manifest bounds give real engines.

Anything the grammar does not recognize (function calls, arithmetic,
subqueries) degrades per-SUBTREE to an `unknown` leaf that answers
"may match" — the enclosing AND legs still prune.  A text that fails
to tokenize at all yields `None` (no stats pruning; callers fall back
to scan-pruning, where the candidate files are read once and the
matched-file set — O(matched files), metadata-sized — narrows the
rewrite).

Scale note: evaluation is driver-side over per-file METADATA (one
tiny AST walk per live file), the same cost class as the existing
range pruners; no data is read here.
"""

from __future__ import annotations

import re
from datetime import date, datetime

__all__ = ["parse_predicate", "may_match"]

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][\w.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN", "IS", "NULL", "TRUE", "FALSE"}


def _tokenize(text: str) -> list[tuple[str, object]] | None:
    toks: list[tuple[str, object]] = []
    i = 0
    while i < len(text):
        if text[i].isspace():
            i += 1
            continue
        m = _TOKEN_RE.match(text, i)
        if not m or m.end() == i:
            return None  # untokenizable char: no stats pruning at all
        i = m.end()
        if m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            raw = m.group("num")
            toks.append(
                ("lit", float(raw) if re.search(r"[.eE]", raw) else int(raw))
            )
        elif m.group("op") is not None:
            toks.append(("op", m.group("op")))
        elif m.group("lpar") is not None:
            toks.append(("(", "("))
        elif m.group("rpar") is not None:
            toks.append((")", ")"))
        elif m.group("comma") is not None:
            toks.append((",", ","))
        else:
            w = m.group("word")
            up = w.upper()
            if up in _KEYWORDS:
                if up == "TRUE":
                    toks.append(("lit", True))
                elif up == "FALSE":
                    toks.append(("lit", False))
                elif up == "NULL":
                    toks.append(("null", None))
                else:
                    toks.append(("kw", up))
            else:
                toks.append(("ident", w))
    return toks


class _P:
    """Recursive-descent parser over the token list.  Unrecognized
    primaries consume balanced tokens up to the next top-level AND/OR
    and become ("unknown",) leaves — sound, never a parse failure."""

    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.i != len(self.toks):
            return ("unknown",)  # trailing junk: give up cleanly
        return node

    def parse_or(self):
        node = self.parse_and()
        while self.peek() == ("kw", "OR"):
            self.next()
            node = ("or", node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_not()
        while self.peek() == ("kw", "AND"):
            self.next()
            node = ("and", node, self.parse_not())
        return node

    def parse_not(self):
        if self.peek() == ("kw", "NOT"):
            self.next()
            return ("not", self.parse_not())
        return self.parse_primary()

    def _skip_unknown(self):
        """Consume tokens until the next AND/OR at paren depth 0 (or a
        closing paren of the enclosing group) — the subtree becomes an
        `unknown` leaf and its siblings still prune."""
        depth = 0
        while self.i < len(self.toks):
            k, v = self.peek()
            if depth == 0 and (
                (k == "kw" and v in ("AND", "OR")) or k == ")"
            ):
                break
            if k == "(":
                depth += 1
            elif k == ")":
                depth -= 1
            self.next()
        return ("unknown",)

    def parse_primary(self):
        start = self.i
        k, v = self.peek()
        if k == "(":
            self.next()
            node = self.parse_or()
            if self.peek() == (")", ")"):
                self.next()
                return node
            self.i = start
            return self._skip_unknown()
        if k != "ident":
            return self._skip_unknown()
        col = v
        self.next()
        k, v = self.peek()
        if k == "op":
            self.next()
            lk, lv = self.peek()
            if lk == "lit":
                self.next()
                op = "!=" if v == "<>" else v
                return ("cmp", col, op, lv)
            if lk == "null":  # col = NULL is never TRUE; treat unknown
                self.next()
                return ("unknown",)
            self.i = start
            return self._skip_unknown()
        if (k, v) == ("kw", "BETWEEN"):
            self.next()
            lo_k, lo_v = self.next()
            if lo_k != "lit" or self.peek() != ("kw", "AND"):
                self.i = start
                return self._skip_unknown()
            self.next()
            hi_k, hi_v = self.next()
            if hi_k != "lit":
                self.i = start
                return self._skip_unknown()
            return ("between", col, lo_v, hi_v)
        if (k, v) == ("kw", "IN"):
            self.next()
            if self.peek() != ("(", "("):
                self.i = start
                return self._skip_unknown()
            self.next()
            vals = []
            ok = True
            while True:
                ik, iv = self.next()
                if ik == "lit":
                    vals.append(iv)
                elif ik == "null":
                    vals.append(None)
                else:
                    ok = False
                    break
                nk, _nv = self.next()
                if nk == ")":
                    break
                if nk != ",":
                    ok = False
                    break
            if not ok:
                self.i = start
                return self._skip_unknown()
            return ("in", col, vals)
        if (k, v) == ("kw", "IS"):
            self.next()
            if self.peek() == ("kw", "NOT"):
                self.next()
                if self.peek() == ("null", None):
                    self.next()
                    return ("notnull", col)
                self.i = start
                return self._skip_unknown()
            if self.peek() == ("null", None):
                self.next()
                return ("isnull", col)
            self.i = start
            return self._skip_unknown()
        self.i = start
        return self._skip_unknown()


def parse_predicate(text: str):
    """Predicate text → pruning AST, or None when untokenizable
    (callers then skip stats pruning entirely)."""
    toks = _tokenize(text)
    if toks is None or not toks:
        return None
    return _P(toks).parse()


def _cmp_vals(a, b):
    """Three-way compare across the type seams statistics actually
    produce (JSON stats vs SQL literals): numbers, strings,
    string-vs-number (numeric parse), ISO-date/timestamp strings vs
    date/datetime.  None = incomparable (callers stay conservative)."""
    if a is None or b is None:
        return None
    if isinstance(a, bool) or isinstance(b, bool):
        if isinstance(a, bool) and isinstance(b, bool):
            return (a > b) - (a < b)
        return None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return (a > b) - (a < b)
    if isinstance(a, str) and isinstance(b, (int, float)):
        try:
            av = float(a)
        except ValueError:
            return None
        return (av > b) - (av < b)
    if isinstance(b, str) and isinstance(a, (int, float)):
        r = _cmp_vals(b, a)
        return None if r is None else -r
    if isinstance(a, (date, datetime)) and isinstance(b, str):
        try:
            bv = (
                datetime.fromisoformat(b)
                if isinstance(a, datetime)
                else date.fromisoformat(b)
            )
        except ValueError:
            return None
        return (a > bv) - (a < bv)
    if isinstance(b, (date, datetime)) and isinstance(a, str):
        r = _cmp_vals(b, a)
        return None if r is None else -r
    if isinstance(a, str) and isinstance(b, str):
        return (a > b) - (a < b)
    try:
        return (a > b) - (a < b)
    except TypeError:
        return None


def _leaf_may(node, info):
    """May-match for a comparison leaf given (mn, mx, has_null,
    all_null) — each element possibly None (unknown)."""
    mn, mx, has_null, all_null = info
    kind = node[0]
    if kind in ("cmp", "between", "in") and all_null is True:
        return False  # no non-null value exists to satisfy a comparison
    if kind == "cmp":
        _, _c, op, v = node
        if op == "<":
            r = _cmp_vals(mn, v)
            return r is None or r < 0
        if op == "<=":
            r = _cmp_vals(mn, v)
            return r is None or r <= 0
        if op == ">":
            r = _cmp_vals(mx, v)
            return r is None or r > 0
        if op == ">=":
            r = _cmp_vals(mx, v)
            return r is None or r >= 0
        if op == "=":
            rlo = _cmp_vals(mn, v)
            rhi = _cmp_vals(mx, v)
            if rlo is not None and rlo > 0:
                return False
            if rhi is not None and rhi < 0:
                return False
            return True
        if op == "!=":
            rlo = _cmp_vals(mn, v)
            rhi = _cmp_vals(mx, v)
            # only a constant column pinned to v has no differing row
            if rlo == 0 and rhi == 0:
                return False
            return True
        return True
    if kind == "between":
        _, _c, lo, hi = node
        rhi = _cmp_vals(mx, lo)
        rlo = _cmp_vals(mn, hi)
        if rhi is not None and rhi < 0:
            return False
        if rlo is not None and rlo > 0:
            return False
        return True
    if kind == "in":
        _, _c, vals = node
        live = [v for v in vals if v is not None]  # IN never matches NULL
        if not live:
            return False
        results = []
        for v in live:
            rlo = _cmp_vals(mn, v)
            rhi = _cmp_vals(mx, v)
            if (rlo is not None and rlo > 0) or (
                rhi is not None and rhi < 0
            ):
                results.append(False)
            else:
                results.append(True)
        return any(results)
    if kind == "isnull":
        return has_null is not False  # unknown → may
    if kind == "notnull":
        return all_null is not True
    return True


def _leaf_may_not(node, info):
    """May a row make the leaf FALSE (NOT leaf TRUE)?  Nulls make a
    comparison UNKNOWN, not FALSE — so NOT over them stays not-TRUE."""
    mn, mx, has_null, all_null = info
    kind = node[0]
    if kind in ("cmp", "between", "in") and all_null is True:
        return False
    if kind == "cmp":
        _, c, op, v = node
        inverse = {"<": ">=", "<=": ">", ">": "<=", ">=": "<", "=": "!=",
                   "!=": "="}[op]
        return _leaf_may(("cmp", c, inverse, v), info)
    if kind == "between":
        _, c, lo, hi = node
        return _leaf_may(("cmp", c, "<", lo), info) or _leaf_may(
            ("cmp", c, ">", hi), info
        )
    if kind == "in":
        _, _c, vals = node
        live = [v for v in vals if v is not None]
        if len(vals) != len(live):
            return False  # NOT IN with a NULL item is never TRUE
        if not live:
            return True
        # FALSE needs a row outside the list: disprovable only when
        # the column is constant and that constant is in the list
        if mn is not None and _cmp_vals(mn, mx) == 0:
            if any(_cmp_vals(mn, v) == 0 for v in live):
                return False
        return True
    if kind == "isnull":
        return all_null is not True
    if kind == "notnull":
        return has_null is not False
    return True


def may_match(node, colinfo) -> bool:
    """Sound "file may contain a TRUE row" walk.  `colinfo(col)` →
    (mn, mx, has_null, all_null) or None when the file has no usable
    statistics for that column."""
    kind = node[0]
    if kind == "and":
        return may_match(node[1], colinfo) and may_match(node[2], colinfo)
    if kind == "or":
        return may_match(node[1], colinfo) or may_match(node[2], colinfo)
    if kind == "not":
        return _may_not(node[1], colinfo)
    if kind == "unknown":
        return True
    col = node[1]
    info = colinfo(col)
    if info is None:
        return True
    return _leaf_may(node, info)


def _may_not(node, colinfo) -> bool:
    kind = node[0]
    if kind == "and":  # NOT(a AND b) → NOT a OR NOT b
        return _may_not(node[1], colinfo) or _may_not(node[2], colinfo)
    if kind == "or":
        return _may_not(node[1], colinfo) and _may_not(node[2], colinfo)
    if kind == "not":
        return may_match(node[1], colinfo)
    if kind == "unknown":
        return True
    col = node[1]
    info = colinfo(col)
    if info is None:
        return True
    return _leaf_may_not(node, info)
