"""SPARQL text front end for the BGP compiler — parse a SPARQL query
string (the subset ``operators/graphquery.py`` executes) into the
compiler's kwargs and run it on the Spark triple table.

The reference emits JSON-LD for downstream SPARQL stores; its users write
SPARQL text. This module closes that gap: the four query forms (SELECT /
ASK / CONSTRUCT / DESCRIBE) over one WHERE group with triple patterns
(``;``/``,`` abbreviations), property paths (``^ / | + * ?`` and ``!``
negated sets), OPTIONAL, FILTER (portable expression subset), FILTER
[NOT] EXISTS, MINUS, BIND, VALUES, UNION (top-level alternation of
groups), DISTINCT, ORDER BY / LIMIT / OFFSET, and the aggregate form
(``SELECT ?g (COUNT(*) AS ?n) ... GROUP BY ?g HAVING (...)`` →
``bgp_aggregate``; COUNT/SUM/MIN/MAX/AVG plus SAMPLE (pinned to min —
the deterministic compliant choice) and GROUP_CONCAT (pinned to sorted
element order; ``; SEPARATOR="..."`` supported); output column order
is GROUP BY vars then aliases).

Terms: prefixed names stay in CURIE space verbatim (the triple tables
store CURIEs); ``<full-iri>`` terms are kept with the brackets stripped;
``"literal"`` (optionally ``^^dt`` / ``@lang``, both dropped — the obj
column stores the lexical form); numeric literals keep their lexical
form. PREFIX declarations are accepted and recorded but not expanded —
they document the CURIE space, they do not rewrite it (matching how the
engine's emitter addresses nodes). BASE, named graphs, subqueries, and
property functions are out of scope and raise.

FILTER/BIND expressions pass through as the compiler's portable strings
after a conservative token rewrite (``?var``→``var``, ``&&``→AND,
``||``→OR, ``!``→NOT except ``!=``). SPARQL string builtins with an
exact cross-engine equivalent compile in: STRLEN→length, UCASE→upper,
LCASE→lower, SUBSTR→substring (1-based on both), CONTAINS→contains,
and STRSTARTS/STRENDS→``left/right(x, N) = 'lit'`` (structural — the
engines disagree on the function NAME, so the portable form is a
prefix/suffix comparison; the needle must be a plain literal). Anything
the two engines would disagree on (REGEX, STR, LANG, ...) raises with
the function name.

Scale: this is a front end; the plan is whatever ``bgp_query`` builds —
parsing adds zero runtime cost to the query itself.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame

from .graphquery import (
    _is_var,
    _var,
    bgp_ask,
    bgp_query,
    bgp_sql,
    bgp_union,
    bgp_union_sql,
    values_filter,
)

Pattern = Tuple[str, str, str]

_TOKEN_RE = re.compile(
    r"""
    (?P<string>"(?:[^"\\]|\\.)*"(?:\^\^\S+|@[A-Za-z\-]+)?
       |'(?:[^'\\]|\\.)*'(?:\^\^\S+|@[A-Za-z\-]+)?)
  | (?P<iri><[^<>\s]*>)
  | (?P<var>\?[A-Za-z_][\w]*)
  | (?P<punct>\{|\}|\(|\)|\.(?!\d)|;|,)
  | (?P<word>[^\s{}(),;"']+)
    """,
    re.VERBOSE,
)

_UNSUPPORTED_FUNCS = (
    "regex", "str", "lang", "datatype", "bound", "sameterm", "isiri",
    "isliteral", "isblank", "bnode", "iri", "uri",
    "now", "rand", "uuid", "struuid",
    "md5", "sha1", "sha256", "encode_for_uri", "langmatches",
)

#: SPARQL string builtins whose portable compilation is a pure function
#: RENAME — the target name exists with identical semantics in BOTH
#: Spark SQL and DuckDB (verified: contains/length/upper/lower/substring
#: are 1-based and NULL-propagating on both engines), so the shared
#: filter string stays engine-portable. STRSTARTS/STRENDS are handled
#: structurally in ``_rewrite_expr`` (the engines disagree on the
#: function name — startswith vs starts_with — so they compile to the
#: portable ``left/right(x, N) = 'lit'`` comparison instead).
_FUNC_RENAMES = {
    "strlen": "length",
    "ucase": "upper",
    "lcase": "lower",
    "substr": "substring",
    "contains": "contains",
}


class SparqlSyntaxError(ValueError):
    pass


def _strip_comments(text: str) -> str:
    """Remove ``#``-to-end-of-line comments, but only OUTSIDE string
    literals and ``<...>`` IRIs — a legal literal like ``"a # b"`` or an
    IRI fragment ``<http://ex#f>`` keeps its ``#``. Mirrors the SPARQL
    grammar: a comment starts at line start or after whitespace (never
    mid-token; prefixed names cannot contain ``#``)."""
    out: List[str] = []
    i, n = 0, len(text)
    mode = None  # "'"/'"' inside a string literal, "<" inside an IRI
    prev_ws = True
    while i < n:
        ch = text[i]
        if mode in ("'", '"'):
            out.append(ch)
            if ch == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if ch == mode:
                mode = None
                prev_ws = False
            i += 1
            continue
        if mode == "<":
            out.append(ch)
            if ch == ">" or ch.isspace():
                # whitespace means this '<' was a comparison operator,
                # not an IRI opener (IRIs in the subset have no spaces)
                mode = None
                prev_ws = ch.isspace()
            i += 1
            continue
        if ch in ("'", '"', "<"):
            mode = ch
            out.append(ch)
            prev_ws = False
            i += 1
            continue
        if ch == "#" and prev_ws:
            while i < n and text[i] != "\n":
                i += 1
            out.append(" ")
            continue
        out.append(ch)
        prev_ws = ch.isspace()
        i += 1
    return "".join(out)


def _tokenize(text: str) -> List[str]:
    # strip comments during scanning (only outside string/IRI tokens:
    # a literal containing ' # ' must survive — see _strip_comments)
    text = _strip_comments(text)
    toks: List[str] = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        between = text[pos:m.start()]
        if between.strip():
            raise SparqlSyntaxError(f"cannot tokenize {between.strip()!r}")
        pos = m.end()
        tok = m.group(0)
        # a word greedily captures a trailing '.' ("?t." / "rdf:type.");
        # SPARQL local names cannot END with '.', so splitting one
        # trailing dot back out is always safe
        if (
            m.lastgroup in ("word", "var")
            and tok.endswith(".")
            and len(tok) > 1
        ):
            toks.append(tok[:-1])
            toks.append(".")
        else:
            toks.append(tok)
    if text[pos:].strip():
        raise SparqlSyntaxError(f"cannot tokenize {text[pos:].strip()!r}")
    return toks


def _term(tok: str, pred: bool = False) -> str:
    """SPARQL term token → compiler term string. ``a`` means rdf:type in
    PREDICATE position only (elsewhere it is a legal local name)."""
    if tok.startswith("?"):
        return tok
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if tok[0] in "\"'":
        end = _literal_end(tok)
        body = tok[1:end]
        return re.sub(r"\\(.)", r"\1", body)
    if pred and tok == "a":
        return "rdf:type"
    return tok


def _literal_end(tok: str) -> int:
    q = tok[0]
    i = 1
    while i < len(tok):
        if tok[i] == "\\":
            i += 2
            continue
        if tok[i] == q:
            return i
        i += 1
    raise SparqlSyntaxError(f"unterminated literal {tok!r}")


def _func_args(toks: List[str], i: int) -> "tuple[List[List[str]], int]":
    """Split the balanced argument list of the function call starting at
    ``toks[i]`` (name) ``toks[i+1]`` ("(") into top-level-comma-separated
    token lists. Returns ``(args, index_after_closing_paren)``."""
    if i + 1 >= len(toks) or toks[i + 1] != "(":
        raise SparqlSyntaxError(f"{toks[i]} is not a function call")
    j, depth = i + 2, 1
    args: List[List[str]] = []
    cur: List[str] = []
    while j < len(toks):
        t = toks[j]
        if t == "(":
            depth += 1
            cur.append(t)
        elif t == ")":
            depth -= 1
            if depth == 0:
                break
            cur.append(t)
        elif t == "," and depth == 1:
            args.append(cur)
            cur = []
        else:
            cur.append(t)
        j += 1
    if depth != 0:
        raise SparqlSyntaxError("unbalanced parens in function call")
    args.append(cur)
    return args, j + 1


def _plain_literal(arg: List[str], fname: str) -> "tuple[str, int]":
    """Require a single PLAIN string-literal token (no datatype/lang
    tag, no backslash escapes — those would need engine-specific
    escaping) → ``(sql_literal, char_count)``."""
    if len(arg) != 1 or not arg[0] or arg[0][0] not in "\"'":
        raise SparqlSyntaxError(
            f"{fname} needs a plain string literal 2nd argument in the "
            "portable subset"
        )
    tok = arg[0]
    end = _literal_end(tok)
    if end != len(tok) - 1:
        raise SparqlSyntaxError(
            f"{fname} literal must be plain (no datatype/lang tag)"
        )
    body = tok[1:end]
    if "\\" in body:
        raise SparqlSyntaxError(
            f"{fname} literal with backslash escapes is not in the "
            "portable subset"
        )
    return "'" + body.replace("'", "''") + "'", len(body)


class _Parser:
    def __init__(self, toks: List[str]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> Optional[str]:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def kw(self, word: str) -> bool:
        t = self.peek()
        return t is not None and t.upper() == word

    def take(self) -> str:
        if self.i >= len(self.toks):
            raise SparqlSyntaxError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.take()
        if t.upper() != tok.upper():
            raise SparqlSyntaxError(f"expected {tok!r}, got {t!r}")

    # ---- groups -------------------------------------------------------

    def parse_group(self) -> Dict:
        """One ``{ ... }`` group → bgp_query kwargs dict — or, for the
        standard union form ``{ {A} UNION {B} ...}``, a
        ``{"__union__": [blocks]}`` marker (a braced single group
        without UNION collapses to the group itself)."""
        self.expect("{")
        if self.kw("{"):
            branches = [self.parse_group()]
            while self.kw("UNION"):
                self.take()
                branches.append(self.parse_group())
            self.expect("}")
            if len(branches) == 1:
                return branches[0]
            for b in branches:
                if "__union__" in b:
                    raise SparqlSyntaxError("nested UNION is not supported")
            return {"__union__": branches}
        out: Dict = {
            "patterns": [], "optional": [], "filters": [], "minus": [],
            "exists": [], "bind": [],
        }
        while not self.kw("}"):
            u = self.peek().upper() if self.peek() else ""
            if u == "OPTIONAL":
                self.take()
                sub = self.parse_group()
                self._merge_simple(sub, out, "optional")
            elif u == "MINUS":
                self.take()
                sub = self.parse_group()
                self._merge_simple(sub, out, "minus")
            elif u == "FILTER":
                self.take()
                nxt = self.peek().upper() if self.peek() else ""
                if nxt == "EXISTS":
                    self.take()
                    sub = self.parse_group()
                    self._merge_simple(sub, out, "exists")
                elif nxt == "NOT":
                    self.take()
                    self.expect("EXISTS")
                    sub = self.parse_group()
                    self._merge_simple(sub, out, "minus")
                elif self.kw("("):
                    out["filters"].append(self._parse_expr_parens())
                else:
                    # FILTER func(args) — constraint as a direct call;
                    # re-assemble the token stream so the rewriter sees
                    # the function in call position (STRSTARTS & co need
                    # structural, not textual, handling)
                    fname = self.take()
                    toks = self._collect_parens()
                    out["filters"].append(
                        self._rewrite_expr([fname, "("] + toks + [")"])
                    )
            elif u == "BIND":
                self.take()
                self.expect("(")
                depth, toks = 1, []
                while depth:
                    t = self.take()
                    if t == "(":
                        depth += 1
                    elif t == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    toks.append(t)
                # split on trailing AS ?alias
                if len(toks) < 2 or toks[-2].upper() != "AS":
                    raise SparqlSyntaxError("BIND needs (expr AS ?alias)")
                alias = toks[-1]
                if not alias.startswith("?"):
                    raise SparqlSyntaxError("BIND alias must be a variable")
                expr = self._rewrite_expr(toks[:-2])
                out["bind"].append((expr, alias[1:]))
            elif u == "GRAPH":
                # SPARQL 1.1 §13.3 — named-graph scoping. Text subset:
                # the GRAPH block must be the ONLY element of its
                # enclosing group (GRAPH <g> {...} / GRAPH ?g {...} as
                # the whole WHERE clause); mixing it with sibling
                # patterns would need dataset-merge semantics the quad
                # compiler deliberately does not guess at.
                if any(
                    out[k]
                    for k in ("patterns", "optional", "filters",
                              "minus", "exists", "bind")
                ):
                    raise SparqlSyntaxError(
                        "GRAPH must be the only element of its group "
                        "(text subset)"
                    )
                self.take()
                gtok = self.take()
                gterm = gtok if gtok.startswith("?") else _term(gtok)
                sub = self.parse_group()
                if "__union__" in sub:
                    raise SparqlSyntaxError(
                        "UNION inside GRAPH is not supported "
                        "(text subset)"
                    )
                if "graph" in sub:
                    raise SparqlSyntaxError("nested GRAPH is not supported")
                sub["graph"] = gterm
                if not self.kw("}"):
                    raise SparqlSyntaxError(
                        "GRAPH must be the only element of its group "
                        "(text subset)"
                    )
                self.expect("}")
                return sub
            elif u == "VALUES":
                self.take()
                out["filters"].append(self._parse_values())
            elif u == "{":
                raise SparqlSyntaxError(
                    "group blocks may only open a UNION alternation "
                    "(as the FIRST member of their enclosing group)"
                )
            else:
                self._parse_triples_block(out["patterns"])
        self.expect("}")
        return out

    def _merge_simple(self, sub: Dict, out: Dict, key: str) -> None:
        if "__union__" in sub:
            raise SparqlSyntaxError(
                f"UNION inside {key.upper()} is not supported"
            )
        if "graph" in sub:
            raise SparqlSyntaxError(
                f"GRAPH inside {key.upper()} is not supported "
                "(text subset)"
            )
        for extra in ("optional", "minus", "exists", "bind", "filters"):
            if sub[extra]:
                raise SparqlSyntaxError(
                    f"{key.upper()} groups must contain only triple "
                    f"patterns (found {extra})"
                )
        out[key].extend(sub["patterns"])

    def _parse_pred_term(self) -> str:
        """Predicate position: plain term, or the spec's parenthesized
        property-set forms ``(p|q)`` / ``!(p|q)`` (SPARQL 1.1 §9.1
        PathNegatedPropertySet) — normalized to the compiler's internal
        ``p|q`` / ``!p|q`` strings. A path modifier on a parenthesized
        group (``(p|q)+``) is refused loudly: the closure engine iterates
        single-predicate edge sets only."""
        if self.peek() == "!" and self.peek(1) == "(":
            self.take()
            self.take()
            return "!" + self._take_alternation()
        if self.peek() == "(":
            self.take()
            return self._take_alternation()
        return _term(self.take(), pred=True)

    def _take_alternation(self) -> str:
        parts: List[str] = []
        while not self.kw(")"):
            for piece in self.take().split("|"):
                if piece:
                    parts.append(_term(piece, pred=True))
        self.take()
        if self.peek() in ("+", "*"):
            raise SparqlSyntaxError(
                "path modifier on a parenthesized property set is not "
                "supported — close over one predicate at a time"
            )
        if not parts:
            raise SparqlSyntaxError("empty property set in ()")
        return "|".join(parts)

    def _parse_triples_block(self, into: List[Pattern]) -> None:
        s = _term(self.take())
        while True:
            p = self._parse_pred_term()
            while True:
                o = _term(self.take())
                into.append((s, p, o))
                if self.kw(","):
                    self.take()
                    continue
                break
            if self.kw(";"):
                self.take()
                # tolerate trailing ; before . or }
                if self.kw(".") or self.kw("}"):
                    break
                continue
            break
        if self.kw("."):
            self.take()

    # ---- expressions --------------------------------------------------

    def _collect_parens(self) -> List[str]:
        self.expect("(")
        depth, toks = 1, []
        while depth:
            t = self.take()
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    break
            toks.append(t)
        return toks

    def _parse_expr_parens(self) -> str:
        return self._rewrite_expr(self._collect_parens())

    def _rewrite_expr(self, toks: List[str]) -> str:
        parts: List[str] = []
        i, n = 0, len(toks)
        while i < n:
            t = toks[i]
            if len(t) > 1 and t[0] == "!" and t[1] != "=":
                # the tokenizer glues prefix negation onto the next word
                # (e.g. "!STRENDS") — split so both halves rewrite
                toks = toks[:i] + ["!", t[1:]] + toks[i + 1:]
                n = len(toks)
                t = "!"
            low = t.lower().rstrip("(")
            is_call = t.endswith("(") or (i + 1 < n and toks[i + 1] == "(")
            if is_call and low in ("strstarts", "strends"):
                args, i = _func_args(toks, i)
                if len(args) != 2:
                    raise SparqlSyntaxError(
                        f"{low.upper()} takes exactly 2 arguments"
                    )
                arg1 = self._rewrite_expr(args[0])
                lit, nchars = _plain_literal(args[1], low.upper())
                fn = "left" if low == "strstarts" else "right"
                parts.append(f"( {fn} ( {arg1} , {nchars} ) = {lit} )")
                continue
            if is_call and low in _FUNC_RENAMES:
                parts.append(_FUNC_RENAMES[low])
                if t.endswith("("):
                    parts.append("(")
                i += 1
                continue
            if low in _UNSUPPORTED_FUNCS and t.endswith("("):
                raise SparqlSyntaxError(
                    f"function {low.upper()}() is not in the portable "
                    "expression subset"
                )
            if t.startswith("?"):
                parts.append(t[1:])
            elif t == "&&":
                parts.append("AND")
            elif t == "||":
                parts.append("OR")
            elif t == "!":
                parts.append("NOT")
            elif t[0] in "\"'":
                body = t[1:_literal_end(t)]
                parts.append("'" + body.replace("'", "''") + "'")
            else:
                if low in _UNSUPPORTED_FUNCS:
                    raise SparqlSyntaxError(
                        f"function {low.upper()} is not in the portable "
                        "expression subset"
                    )
                parts.append(t)
            i += 1
        return " ".join(parts)

    def _parse_values(self) -> str:
        # VALUES ?v { ... }  |  VALUES (?a ?b) { (..) (..) }
        if self.kw("("):
            self.take()
            names = []
            while not self.kw(")"):
                v = self.take()
                if not v.startswith("?"):
                    raise SparqlSyntaxError("VALUES vars must be ?vars")
                names.append(v[1:])
            self.take()
            self.expect("{")
            rows = []
            while self.kw("("):
                self.take()
                row = []
                while not self.kw(")"):
                    row.append(_term(self.take()))
                self.take()
                if len(row) != len(names):
                    raise SparqlSyntaxError("VALUES row arity mismatch")
                rows.append(tuple(row))
            self.expect("}")
            return values_filter(names, rows)
        v = self.take()
        if not v.startswith("?"):
            raise SparqlSyntaxError("VALUES vars must be ?vars")
        self.expect("{")
        rows = []
        while not self.kw("}"):
            rows.append((_term(self.take()),))
        self.expect("}")
        return values_filter([v[1:]], rows)


def _group_concat_exprs(
    p: "_Parser", v: str, distinct: bool
) -> "tuple[str, str]":
    """Compile ``GROUP_CONCAT([DISTINCT] ?v [; SEPARATOR="s"])`` to the
    (Spark, DuckDB) aggregate expression pair. The spec leaves element
    order undefined; we pin SORTED order on both engines so the result
    is deterministic and engine-invariant (the SAMPLE→min discipline).
    This is the one aggregate whose two engines need different function
    names (collect_list/sort_array/array_join vs list/list_sort/
    array_to_string), hence the aggs/aggs_sql split in the spec.

    Separator subset: a quoted string without quotes or backslashes
    (those would need engine-specific escaping in the compiled
    expressions) — anything else fails loudly."""
    sep = " "
    if p.peek() == ";":
        p.take()
        t = p.take()
        if not re.match(r"(?i)^SEPARATOR=?$", t):
            raise SparqlSyntaxError(
                'expected SEPARATOR="..." after ";" in GROUP_CONCAT'
            )
        if not t.endswith("="):
            p.expect("=")
        lit = p.take()
        if len(lit) < 2 or lit[0] not in "\"'" or not lit.endswith(lit[0]):
            raise SparqlSyntaxError(
                "GROUP_CONCAT SEPARATOR needs a quoted string"
            )
        sep = lit[1:-1]
    if any(c in sep for c in "'\"\\"):
        raise SparqlSyntaxError(
            "GROUP_CONCAT separator with quotes/backslashes is not in "
            "the subset"
        )
    coll = "collect_set" if distinct else "collect_list"
    d = "DISTINCT " if distinct else ""
    spark = f"array_join(sort_array({coll}({v})), '{sep}')"
    # list() keeps NULLs (collect_list drops them) → FILTER them out;
    # an all-NULL group yields NULL from list(...) FILTER but an empty
    # array from collect_list → coalesce to [] so both sides emit ''
    duck = (
        f"array_to_string(list_sort(coalesce(list({d}{v}) "
        f"FILTER (WHERE {v} IS NOT NULL), [])), '{sep}')"
    )
    return spark, duck


def parse_sparql(text: str) -> Dict:
    """Parse a SPARQL query string → a spec dict:
    ``{"form": "select"|"ask"|"construct"|"describe",
    "blocks": [group_kwargs, ...], "select": [...]|None,
    "distinct": bool, "order_by": [...], "limit": int|None,
    "offset": int, "template": [...]|None, "seeds": [...]|None}`` —
    ``blocks`` has one entry per UNION branch (one entry = plain
    group); ``template`` holds CONSTRUCT's triple patterns; ``seeds``
    holds DESCRIBE's ground terms (variable DESCRIBE is out of the text
    subset)."""
    p = _Parser(_tokenize(text))
    # PREFIX declarations: accepted, recorded, not expanded
    prefixes: Dict[str, str] = {}
    while p.kw("PREFIX"):
        p.take()
        name = p.take()
        iri = p.take()
        prefixes[name.rstrip(":")] = _term(iri)
    if p.kw("BASE"):
        raise SparqlSyntaxError("BASE is not supported (CURIE space)")
    form_tok = p.take().upper()
    if form_tok not in ("SELECT", "ASK", "CONSTRUCT", "DESCRIBE"):
        raise SparqlSyntaxError(f"unknown query form {form_tok}")
    spec: Dict = {
        "form": form_tok.lower(), "prefixes": prefixes, "distinct": False,
        "select": None, "order_by": [], "limit": None, "offset": 0,
        "template": None, "seeds": None,
        "aggs": [], "aggs_sql": [], "group_by": [], "having": [],
    }
    if form_tok == "DESCRIBE":
        seeds = []
        while p.peek() is not None:
            seeds.append(_term(p.take()))
        if not seeds or any(t.startswith("?") for t in seeds):
            raise SparqlSyntaxError(
                "DESCRIBE takes ground terms only (variable DESCRIBE "
                "needs a WHERE binding — out of the text subset)"
            )
        spec["seeds"] = seeds
        spec["blocks"] = []
        return spec
    if form_tok == "CONSTRUCT":
        tpl_group = p.parse_group()
        if "__union__" in tpl_group or any(
            tpl_group[k]
            for k in ("optional", "minus", "exists", "bind", "filters")
        ):
            raise SparqlSyntaxError(
                "CONSTRUCT template must contain only triple patterns"
            )
        spec["template"] = tpl_group["patterns"]
    if form_tok == "SELECT":
        if p.kw("DISTINCT"):
            p.take()
            spec["distinct"] = True
        if p.kw("*"):
            p.take()
        else:
            sel = []
            aggs = []
            aggs_sql = []
            while p.peek() and (
                p.peek().startswith("?") or p.peek() == "("
            ):
                if p.peek().startswith("?"):
                    sel.append(p.take()[1:])
                    continue
                # (AGG([DISTINCT] ?v|*) AS ?alias) — GROUP_CONCAT also
                # takes the spec's `; SEPARATOR="..."` tail
                p.take()  # (
                fn = p.take().upper()
                if fn not in (
                    "COUNT", "SUM", "MIN", "MAX", "AVG",
                    "SAMPLE", "GROUP_CONCAT",
                ):
                    raise SparqlSyntaxError(
                        f"aggregate {fn} is not supported (COUNT/SUM/"
                        "MIN/MAX/AVG/SAMPLE/GROUP_CONCAT)"
                    )
                p.expect("(")
                distinct_kw = ""
                if p.kw("DISTINCT"):
                    p.take()
                    distinct_kw = "DISTINCT "
                arg = p.take()
                if arg == "*":
                    if fn != "COUNT" or distinct_kw:
                        raise SparqlSyntaxError("only COUNT(*) takes *")
                    expr = sql_expr = "count(*)"
                elif arg.startswith("?"):
                    v = arg[1:]
                    if fn == "SAMPLE":
                        # SAMPLE returns an arbitrary value per the
                        # spec; min() is a compliant implementation and
                        # the only deterministic one — pinned on BOTH
                        # engines so the choice is engine-invariant
                        expr = sql_expr = f"min({v})"
                    elif fn == "GROUP_CONCAT":
                        expr, sql_expr = _group_concat_exprs(
                            p, v, bool(distinct_kw)
                        )
                    else:
                        expr = sql_expr = (
                            f"{fn.lower()}({distinct_kw}{v})"
                        )
                else:
                    raise SparqlSyntaxError(
                        f"aggregate argument must be ?var or *, got {arg!r}"
                    )
                p.expect(")")
                p.expect("AS")
                alias = p.take()
                if not alias.startswith("?"):
                    raise SparqlSyntaxError("aggregate alias must be ?var")
                p.expect(")")
                aggs.append((expr, alias[1:]))
                aggs_sql.append((sql_expr, alias[1:]))
            if not sel and not aggs:
                raise SparqlSyntaxError("SELECT needs * or ?vars")
            spec["select"] = sel
            if aggs:
                spec["aggs"] = aggs
                spec["aggs_sql"] = aggs_sql
    if p.kw("WHERE"):
        p.take()
    # union either as WHERE { {A} UNION {B} } (standard) or the braces-
    # elided top-level form { A } UNION { B }
    g = p.parse_group()
    if "__union__" in g:
        blocks = list(g["__union__"])
    else:
        blocks = [g]
    while p.kw("UNION"):
        p.take()
        nxt = p.parse_group()
        if "__union__" in nxt:
            raise SparqlSyntaxError("nested UNION is not supported")
        blocks.append(nxt)
    spec["blocks"] = blocks
    # solution modifiers (+ GROUP BY / HAVING for aggregate form)
    while p.peek() is not None:
        u = p.take().upper()
        if u == "GROUP":
            p.expect("BY")
            while p.peek() and p.peek().startswith("?"):
                spec["group_by"].append(p.take()[1:])
            if not spec["group_by"]:
                raise SparqlSyntaxError("GROUP BY needs ?vars")
        elif u == "HAVING":
            spec["having"].append(p._parse_expr_parens())
        elif u == "ORDER":
            p.expect("BY")
            while p.peek() and (
                p.peek().startswith("?")
                or p.peek().upper() in ("ASC(", "DESC(", "ASC", "DESC")
            ):
                t = p.take()
                if t.upper() in ("ASC", "DESC"):
                    p.expect("(")
                    v = p.take()
                    p.expect(")")
                    spec["order_by"].append(f"{v[1:]} {t.upper()}")
                else:
                    spec["order_by"].append(t[1:])
        elif u == "LIMIT":
            spec["limit"] = int(p.take())
        elif u == "OFFSET":
            spec["offset"] = int(p.take())
        else:
            raise SparqlSyntaxError(f"unexpected trailing token {u!r}")
    return spec


def _check_agg_spec(spec: Dict) -> None:
    """SPARQL aggregate-form restrictions (loud, shared by both
    engines): one group; projected plain variables must all be grouped;
    aggregates and GROUP BY go together; MINUS/EXISTS/BIND inside the
    aggregate form are not supported (bgp_aggregate's surface)."""
    if not spec["aggs"]:
        raise SparqlSyntaxError("GROUP BY/HAVING need an aggregate SELECT")
    if not spec["group_by"]:
        raise SparqlSyntaxError(
            "aggregate SELECT needs GROUP BY (ungrouped aggregates are "
            "not in the subset)"
        )
    if len(spec["blocks"]) != 1:
        raise SparqlSyntaxError("aggregates over UNION are not supported")
    b = spec["blocks"][0]
    if b["bind"]:
        raise SparqlSyntaxError(
            "BIND inside the aggregate form is not supported"
        )
    plain = spec["select"] or []
    bad = [v for v in plain if v not in spec["group_by"]]
    if bad:
        raise SparqlSyntaxError(
            f"projected variables {bad} are not in GROUP BY"
        )
    if spec["distinct"]:
        raise SparqlSyntaxError("DISTINCT with aggregates is redundant")


def _block_kwargs(b: Dict) -> Dict:
    return {
        k: v
        for k, v in b.items()
        if k in ("patterns", "optional", "filters", "minus", "exists",
                 "bind")
        and v
    }


DEFAULT_PATH_MAX_HOPS = 16


def _closure_paths(spec: Dict) -> List[str]:
    """Predicates in the parsed spec that compile to a transitive
    closure (``p+`` / ``p*`` — ``p?`` needs no iteration)."""
    from .graphquery import _is_path, _path_parts

    preds: List[str] = []
    for b in spec.get("blocks", ()):
        for key in ("patterns", "optional", "minus", "exists"):
            for pat in b.get(key, ()):
                if _is_path(pat[1]) and _path_parts(pat[1])[1] in "+*":
                    preds.append(pat[1])
    return preds


def sparql_query(
    triples: DataFrame,
    text: str,
    path_max_hops: Optional[int] = DEFAULT_PATH_MAX_HOPS,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    graph_col: str = "graph",
) -> DataFrame:
    """Execute a SPARQL text query (all four forms) against a triple
    frame via the BGP compiler. The plan is exactly what the
    programmatic API builds — the text front end adds nothing at
    runtime. DESCRIBE returns the bounded subgraph (hops=1; use
    ``describe_nodes`` directly for deeper bounds); CONSTRUCT returns
    the instantiated ``(subj, pred, obj)`` graph.

    A SELECT whose WHERE clause is a single ``GRAPH <g> {...}`` /
    ``GRAPH ?g {...}`` block routes to ``graphquery.quad_query`` —
    ``triples`` must then be a QUAD frame carrying ``graph_col``;
    constant graphs keep the full feature set (delegation), variable
    graphs take quad_query's documented subset, and GRAPH under
    ASK/CONSTRUCT/aggregates/UNION raises.

    **Closure paths are bounded by default.** A pasted ``p+``/``p*``
    compiles to ``transitive_closure`` — unbounded, that is
    O(N·diameter) output pairs, a self-inflicted wound on a dense
    100 TB graph. The text front end therefore caps iteration at
    ``path_max_hops`` (default ``DEFAULT_PATH_MAX_HOPS`` = 16) and
    emits a ``RuntimeWarning`` naming the bounded path(s): pairs whose
    shortest path exceeds the bound are ABSENT from the result. Pass
    ``path_max_hops=None`` for the full fixed point (the programmatic
    ``bgp_query`` default), or a larger bound. Mirrors the ``/sparql``
    endpoint's row-cap philosophy: the paste-a-query surface never
    silently launches an unbounded iteration."""
    spec = parse_sparql(text)
    bounded = _closure_paths(spec) if path_max_hops is not None else []
    if bounded:
        import warnings

        warnings.warn(
            f"property path(s) {sorted(set(bounded))} bounded at "
            f"{path_max_hops} hops — pairs beyond the bound are absent; "
            "pass path_max_hops=None for the full closure",
            RuntimeWarning,
            stacklevel=2,
        )
    hops_kw = {"path_max_hops": path_max_hops} if bounded else {}
    cols = dict(subj_col=subj_col, pred_col=pred_col, obj_col=obj_col)
    if spec["form"] == "describe":
        from .graphquery import describe_nodes

        seeds = triples.sparkSession.createDataFrame(
            [(s,) for s in spec["seeds"]], "node string"
        )
        return describe_nodes(
            triples, seeds, hops=1, obj_is_iri_col=None, **cols
        )
    if spec["form"] == "construct":
        from .graphquery import bgp_construct

        b = spec["blocks"][0]
        if len(spec["blocks"]) != 1 or b["minus"] or b["exists"] or b["bind"]:
            raise SparqlSyntaxError(
                "CONSTRUCT WHERE supports one group with triples/"
                "OPTIONAL/FILTER (programmatic bgp_construct has the "
                "same surface)"
            )
        if b.get("graph"):
            raise SparqlSyntaxError(
                "GRAPH under CONSTRUCT is not supported (SELECT-only)"
            )
        return bgp_construct(
            triples,
            b["patterns"],
            spec["template"],
            optional=b["optional"],
            filters=b["filters"],
            **hops_kw,
            **cols,
        )
    if spec["form"] == "ask":
        if len(spec["blocks"]) != 1:
            raise SparqlSyntaxError("ASK over UNION is not supported")
        b = spec["blocks"][0]
        if b["bind"]:
            raise SparqlSyntaxError("ASK with BIND is not supported")
        if b.get("graph"):
            raise SparqlSyntaxError(
                "GRAPH under ASK is not supported (SELECT-only)"
            )
        return bgp_ask(
            triples,
            b["patterns"],
            optional=b["optional"],
            filters=b["filters"],
            minus=b["minus"],
            exists=b["exists"],
            **hops_kw,
            **cols,
        )
    if spec["aggs"] or spec["group_by"] or spec["having"]:
        from pyspark.sql import functions as _F

        from .graphquery import bgp_aggregate

        _check_agg_spec(spec)
        b = spec["blocks"][0]
        if b.get("graph"):
            raise SparqlSyntaxError(
                "GRAPH with aggregates is not supported (SELECT-only)"
            )
        df = bgp_aggregate(
            triples,
            b["patterns"],
            group_by=spec["group_by"],
            aggs=spec["aggs"],
            optional=b["optional"],
            filters=b["filters"],
            minus=b["minus"],
            exists=b["exists"],
            having=spec["having"],
            **hops_kw,
            **cols,
        )
        if spec["order_by"]:
            def _oc(sp):
                ps = sp.split()
                c = _F.col(ps[0])
                return c.desc() if len(ps) == 2 and ps[1] == "DESC" else (
                    c.asc()
                )
            df = df.orderBy(*[_oc(o) for o in spec["order_by"]])
        elif spec["limit"] is not None or spec["offset"]:
            raise SparqlSyntaxError(
                "limit/offset without ORDER BY is nondeterministic"
            )
        if spec["offset"]:
            df = df.offset(int(spec["offset"]))
        if spec["limit"] is not None:
            df = df.limit(int(spec["limit"]))
        return df
    if len(spec["blocks"]) == 1:
        b = spec["blocks"][0]
        if b.get("graph"):
            from .graphquery import quad_query

            kwargs = _block_kwargs(b)
            patterns = kwargs.pop("patterns", [])
            filters = kwargs.pop("filters", ())
            return quad_query(
                triples,
                b["graph"],
                patterns,
                select=spec["select"],
                distinct=spec["distinct"],
                filters=filters,
                order_by=spec["order_by"],
                limit=spec["limit"],
                offset=spec["offset"],
                graph_col=graph_col,
                **kwargs,
                **hops_kw,
                **cols,
            )
        return bgp_query(
            triples,
            select=spec["select"],
            distinct=spec["distinct"],
            order_by=spec["order_by"],
            limit=spec["limit"],
            offset=spec["offset"],
            **_block_kwargs(b),
            **hops_kw,
            **cols,
        )
    if spec["order_by"] or spec["limit"] is not None or spec["offset"]:
        raise SparqlSyntaxError(
            "modifiers over UNION are not supported — order/limit the "
            "returned frame"
        )
    if any(b.get("graph") for b in spec["blocks"]):
        raise SparqlSyntaxError(
            "GRAPH inside UNION branches is not supported (text subset)"
        )
    return bgp_union(
        triples,
        [_block_kwargs(b) for b in spec["blocks"]],
        select=spec["select"],
        distinct=spec["distinct"],
        **hops_kw,
        **cols,
    )


def sparql_to_sql(
    text: str,
    table: str = "g",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> str:
    """The same parsed query as portable ANSI SQL (bgp_sql /
    bgp_union_sql) — the oracle twin of ``sparql_query``. ASK text
    compiles through ``bgp_ask_sql``, CONSTRUCT through
    ``bgp_construct_sql``; DESCRIBE is iterative (bounded frontier) and
    has no single-SELECT form — it raises here."""
    from .graphquery import bgp_ask_sql

    spec = parse_sparql(text)
    if any(b.get("graph") for b in spec.get("blocks", ())):
        raise SparqlSyntaxError(
            "GRAPH needs a quad-aware oracle — out of the SQL-twin "
            "subset (write the quad join by hand, cf. the "
            "graph_scoped contract row); emitting graph-blind SQL "
            "would silently change the semantics"
        )
    cols = dict(
        table=table, subj_col=subj_col, pred_col=pred_col, obj_col=obj_col
    )
    if spec["form"] == "describe":
        raise SparqlSyntaxError(
            "DESCRIBE has no single-SELECT SQL form (bounded frontier "
            "iteration) — compare against describe_nodes directly"
        )
    if spec["form"] == "construct":
        from .graphquery import bgp_construct_sql

        b = spec["blocks"][0]
        if len(spec["blocks"]) != 1 or b["minus"] or b["exists"] or b["bind"]:
            raise SparqlSyntaxError(
                "CONSTRUCT WHERE supports one group with triples/"
                "OPTIONAL/FILTER (programmatic bgp_construct has the "
                "same surface)"
            )
        return bgp_construct_sql(
            b["patterns"],
            spec["template"],
            optional=b["optional"],
            filters=b["filters"],
            **cols,
        )
    if spec["form"] == "ask":
        if len(spec["blocks"]) != 1:
            raise SparqlSyntaxError("ASK over UNION is not supported")
        b = spec["blocks"][0]
        if b["bind"]:
            raise SparqlSyntaxError("ASK with BIND is not supported")
        return bgp_ask_sql(
            b["patterns"],
            optional=b["optional"],
            filters=b["filters"],
            minus=b["minus"],
            exists=b["exists"],
            **cols,
        )
    if spec["aggs"] or spec["group_by"] or spec["having"]:
        from .graphquery import bgp_aggregate_sql

        _check_agg_spec(spec)
        b = spec["blocks"][0]
        sql = bgp_aggregate_sql(
            b["patterns"],
            group_by=spec["group_by"],
            aggs=spec["aggs_sql"] or spec["aggs"],
            optional=b["optional"],
            filters=b["filters"],
            minus=b["minus"],
            exists=b["exists"],
            having=spec["having"],
            **cols,
        )
        suffix = []
        if spec["order_by"]:
            suffix.append(
                "ORDER BY " + ", ".join(
                    o if len(o.split()) == 2 else f"{o} ASC"
                    for o in spec["order_by"]
                )
            )
        elif spec["limit"] is not None or spec["offset"]:
            raise SparqlSyntaxError(
                "limit/offset without ORDER BY is nondeterministic"
            )
        if spec["limit"] is not None:
            suffix.append(f"LIMIT {int(spec['limit'])}")
        if spec["offset"]:
            suffix.append(f"OFFSET {int(spec['offset'])}")
        if suffix:
            sql = f"SELECT * FROM ({sql}) za " + " ".join(suffix)
        return sql
    if len(spec["blocks"]) == 1:
        return bgp_sql(
            select=spec["select"],
            distinct=spec["distinct"],
            order_by=spec["order_by"],
            limit=spec["limit"],
            offset=spec["offset"],
            **_block_kwargs(spec["blocks"][0]),
            **cols,
        )
    return bgp_union_sql(
        [_block_kwargs(b) for b in spec["blocks"]],
        select=spec["select"],
        distinct=spec["distinct"],
        **cols,
    )


def _template_check(group: Dict, where: str) -> List[Pattern]:
    """Validate an UPDATE template/data group: triple patterns only
    (SPARQL 1.1 Update QuadPattern — no OPTIONAL/FILTER/MINUS/EXISTS/
    BIND/VALUES/UNION), and no property paths (paths are query
    syntax, illegal in templates)."""
    from .graphquery import _is_alternation, _is_path, _is_sequence

    if "__union__" in group:
        raise SparqlSyntaxError(f"UNION is not allowed in {where}")
    for extra in ("optional", "minus", "exists", "bind", "filters"):
        if group.get(extra):
            raise SparqlSyntaxError(
                f"{where} must contain only triple patterns "
                f"(found {extra})"
            )
    for s, p, o in group["patterns"]:
        if not _is_var(p) and (
            _is_path(p) or _is_alternation(p) or _is_sequence(p)
            or p.startswith(("^", "!"))
        ):
            raise SparqlSyntaxError(
                f"property path {p!r} is not allowed in {where}"
            )
    return list(group["patterns"])


def _ground_check(patterns: Sequence[Pattern], where: str) -> None:
    for pat in patterns:
        for t in pat:
            if _is_var(t):
                raise SparqlSyntaxError(
                    f"{where} takes ground triples only (found {t!r})"
                )


def parse_sparql_update(text: str) -> Dict:
    """Parse a SPARQL 1.1 Update request → a spec dict ``{"op", "data",
    "delete", "insert", "where", "prefixes"}``. Supported subset (one
    operation per request):

    * ``INSERT DATA { ground triples }`` / ``DELETE DATA { ... }``
    * ``DELETE WHERE { bgp }`` (the pattern is both template and match,
      so it must be triples-only, per spec)
    * ``DELETE { tpl } INSERT { tpl } WHERE { group }`` with either
      part optional — the WHERE group takes the full single-block
      algebra (OPTIONAL/FILTER/MINUS/EXISTS/BIND/VALUES); UNION and
      named graphs (``WITH``/``GRAPH``/``USING``) are out of the
      subset and refuse loudly.
    """
    p = _Parser(_tokenize(text))
    prefixes: Dict[str, str] = {}
    while p.kw("PREFIX"):
        p.take()
        name = p.take()
        iri = p.take()
        prefixes[name.rstrip(":")] = _term(iri)
    if p.kw("WITH") or p.kw("USING"):
        raise SparqlSyntaxError(
            "named-graph updates (WITH/USING/GRAPH) are out of the subset"
        )
    spec: Dict = {
        "op": None, "data": None, "delete": None, "insert": None,
        "where": None, "prefixes": prefixes,
    }
    tok = p.take().upper() if p.peek() else ""
    if tok == "INSERT":
        if p.kw("DATA"):
            p.take()
            g = p.parse_group()
            spec["data"] = _template_check(g, "INSERT DATA")
            _ground_check(spec["data"], "INSERT DATA")
            spec["op"] = "insert_data"
        else:
            spec["insert"] = _template_check(
                p.parse_group(), "the INSERT template"
            )
            if not p.kw("WHERE"):
                raise SparqlSyntaxError("INSERT template needs WHERE")
            p.take()
            spec["where"] = p.parse_group()
            spec["op"] = "modify"
    elif tok == "DELETE":
        if p.kw("DATA"):
            p.take()
            g = p.parse_group()
            spec["data"] = _template_check(g, "DELETE DATA")
            _ground_check(spec["data"], "DELETE DATA")
            spec["op"] = "delete_data"
        elif p.kw("WHERE"):
            p.take()
            g = p.parse_group()
            spec["delete"] = _template_check(g, "DELETE WHERE")
            spec["where"] = {
                "patterns": list(spec["delete"]), "optional": [],
                "minus": [], "exists": [], "bind": [], "filters": [],
            }
            spec["op"] = "modify"
        else:
            spec["delete"] = _template_check(
                p.parse_group(), "the DELETE template"
            )
            if p.kw("INSERT"):
                p.take()
                spec["insert"] = _template_check(
                    p.parse_group(), "the INSERT template"
                )
            if not p.kw("WHERE"):
                raise SparqlSyntaxError("DELETE template needs WHERE")
            p.take()
            spec["where"] = p.parse_group()
            spec["op"] = "modify"
    else:
        raise SparqlSyntaxError(
            f"unknown update form {tok!r} (INSERT/DELETE)"
        )
    if p.peek() is not None:
        raise SparqlSyntaxError(
            f"one operation per update request (trailing {p.peek()!r})"
        )
    if spec["op"] == "modify" and "__union__" in spec["where"]:
        raise SparqlSyntaxError("UNION in an update WHERE is not supported")
    return spec


def _instantiate_templates(bindings: DataFrame, template: Sequence[Pattern]):
    """Bind each template row against the binding frame — the
    bgp_construct projection loop, shared by delete and insert sets.
    Rows touching an unbound (NULL) variable drop, per spec."""
    from pyspark.sql import functions as F

    bound = set(bindings.columns)

    def term(t: str):
        if _is_var(t):
            v = _var(t)
            if v not in bound:
                raise SparqlSyntaxError(
                    f"template references unbound variable ?{v}"
                )
            return F.col(v)
        return F.lit(t)

    out = None
    for s, pr, o in template:
        row = bindings.select(
            term(s).alias("subj"), term(pr).alias("pred"),
            term(o).alias("obj"),
        ).filter(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        out = row if out is None else out.unionByName(row)
    return out.distinct()


def sparql_update(
    triples: DataFrame,
    text: str,
    path_max_hops: Optional[int] = DEFAULT_PATH_MAX_HOPS,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Execute a SPARQL 1.1 Update request against a triple frame →
    the UPDATED graph as a new ``(subj, pred, obj)`` SET (functional —
    the input frame is never mutated; write the result wherever the
    graph lives). Semantics per the spec's modify order: the WHERE
    bindings are evaluated against the ORIGINAL graph, the DELETE set
    leaves, then the INSERT set enters — so a request that deletes and
    re-derives the same triple keeps it.

    Scale shape: ground DATA forms are driver-literal frames (tiny by
    definition) riding one anti-join/union; template forms cost the
    WHERE query (the bgp compiler's plan: greedy equi-join order,
    broadcast-scaled) plus per-template projections and ONE distinct —
    the base graph scans once and shuffles once. Closure paths in the
    WHERE are bounded by ``path_max_hops`` exactly like
    ``sparql_query``."""
    from pyspark.sql import functions as F

    spec = parse_sparql_update(text)
    spark = triples.sparkSession
    g = triples.select(
        F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    schema = "subj string, pred string, obj string"
    if spec["op"] == "insert_data":
        data = spark.createDataFrame(list(spec["data"]), schema)
        return g.unionByName(data).distinct()
    if spec["op"] == "delete_data":
        data = spark.createDataFrame(list(spec["data"]), schema)
        return g.join(data, on=["subj", "pred", "obj"], how="left_anti")
    bounded = _closure_paths({"blocks": [spec["where"]]})
    hops_kw = (
        {"path_max_hops": path_max_hops}
        if bounded and path_max_hops is not None
        else {}
    )
    if bounded and path_max_hops is not None:
        import warnings

        warnings.warn(
            f"property path(s) {sorted(set(bounded))} bounded at "
            f"{path_max_hops} hops in the update WHERE",
            RuntimeWarning,
            stacklevel=2,
        )
    bindings = bgp_query(
        g, select=None, **_block_kwargs(spec["where"]), **hops_kw
    )
    out = g
    if spec["delete"]:
        dels = _instantiate_templates(bindings, spec["delete"])
        out = out.join(dels, on=["subj", "pred", "obj"], how="left_anti")
    if spec["insert"]:
        ins = _instantiate_templates(bindings, spec["insert"])
        out = out.unionByName(ins).distinct()
    return out


def sparql_update_sql(text: str, table: str = "t") -> str:
    """DuckDB/ANSI replay of ``sparql_update`` — mirrors the engine's
    guards (same parse, same subset refusals), then expresses the modify
    as pure set algebra: ``(g EXCEPT del) UNION ins``. Property paths in
    the WHERE raise (``bgp_sql`` restriction) exactly as the SELECT
    oracle twin does."""
    spec = parse_sparql_update(text)

    def lit(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    def ground_values(patterns: Sequence[Pattern]) -> str:
        return ", ".join(
            f"({lit(s)}, {lit(p)}, {lit(o)})" for s, p, o in patterns
        )

    base = f"SELECT DISTINCT subj, pred, obj FROM {table}"
    if spec["op"] == "insert_data":
        return (
            f"SELECT subj, pred, obj FROM ({base}) g\n"
            f"UNION\n"
            f"SELECT * FROM (VALUES {ground_values(spec['data'])}) "
            "v(subj, pred, obj)"
        )
    if spec["op"] == "delete_data":
        return (
            f"SELECT subj, pred, obj FROM ({base}) g\n"
            f"EXCEPT\n"
            f"SELECT * FROM (VALUES {ground_values(spec['data'])}) "
            "v(subj, pred, obj)"
        )
    # bindings evaluate over the raw table (the engine uses the
    # distinct'd set — equal binding SETS, and the template arms UNION
    # away any multiplicity difference)
    inner = bgp_sql(select=None, table=table, **_block_kwargs(spec["where"]))

    def tpl_arm(patterns: Sequence[Pattern]) -> str:
        arms = []
        for s, p, o in patterns:
            def term(t: str) -> str:
                return _var(t) if _is_var(t) else lit(t)

            guards = [
                f"{_var(t)} IS NOT NULL" for t in (s, p, o) if _is_var(t)
            ]
            w = (" WHERE " + " AND ".join(guards)) if guards else ""
            arms.append(
                f"SELECT {term(s)} AS subj, {term(p)} AS pred, "
                f"{term(o)} AS obj FROM ({inner}) b{w}"
            )
        return "\nUNION\n".join(arms)

    sql = f"SELECT subj, pred, obj FROM ({base}) gg"
    if spec["delete"]:
        sql += (
            "\nEXCEPT\nSELECT subj, pred, obj FROM (\n"
            f"{tpl_arm(spec['delete'])}\n) dels"
        )
    if spec["insert"]:
        sql = (
            f"SELECT subj, pred, obj FROM (\n{sql}\n) kept"
            "\nUNION\nSELECT subj, pred, obj FROM (\n"
            f"{tpl_arm(spec['insert'])}\n) ins"
        )
    return sql
