"""EDN query front door — run REAL Datomic query text against the
engine (`q_edn`), so queries from the reference's examples
(examples/explore_db.clj:13-45) paste in verbatim.

Built on the repo's EDN reader (edn.py), which collapses vectors and
lists into Python lists; clause shapes are therefore recovered by
CONTEXT. Rule invocations work in BOTH Datomic spellings: the wrapped
form `[(rule ?a ?b)]` and the bare form `(rule ?a ?b)` — a :where
entry whose head is a plain symbol (not ?var / :keyword / $db / _) is
compiled as an invocation when the symbol names a declared rule, and
REJECTED with a DatalogError otherwise (never silently scanned as a
triple pattern; Datomic entity positions are vars/eids/idents, so a
plain-symbol head can only mean a rule call).

Supported surface (delegating to plans/datalog.py):
  - vector queries `[:find ... :in ... :with ... :where ...]` and map
    queries `{:find [...] :where [...]}`;
  - every :where clause family the compiler supports — patterns,
    predicates, function bindings `[(+ ?a ?b) ?c]`, (not ...), (or ...)
    with (and ...) legs, (missing? ...), rule invocations;
  - :in scalars / collections / tuples / relations ($ and % markers are
    accepted and skipped — the datoms view and rules arrive as Python
    arguments);
  - rules as EDN text via the `rules` keyword argument:
    "[[(ancestor ?x ?y) [?e :node/id ?x] ...] ...]".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..edn import loads
from .datalog import DatalogError, q

_SECTIONS = {
    ":find", ":in", ":with", ":where", ":limit", ":offset",
    ":keys", ":syms", ":strs",
}


def _is_plain_symbol(head) -> bool:
    """A head that can only be a rule name (or a mistake): a string
    that is not a ?var, :keyword, $db marker, or _ wildcard. Datomic
    entity positions are vars / numeric eids / :idents / lookup-ref
    vectors — never a bare symbol — so this is unambiguous."""
    return isinstance(head, str) and not head.startswith(("?", ":", "$", "_"))


def _conv_call(form: list, rule_names: frozenset = frozenset()):
    """A call form (predicate / fn / rule / not / or / and) -> tuple."""
    if not form:
        raise DatalogError("empty call form in query")
    head = form[0]
    if head == "not":
        return tuple(["not"] + [_conv_inner(c, rule_names) for c in form[1:]])
    if head == "not-join":
        return tuple(
            ["not-join", list(form[1])]
            + [_conv_inner(c, rule_names) for c in form[2:]]
        )
    if head == "or":
        return tuple(["or"] + [_conv_leg(c, rule_names) for c in form[1:]])
    if head == "or-join":
        return tuple(
            ["or-join", list(form[1])]
            + [_conv_leg(c, rule_names) for c in form[2:]]
        )
    if head == "and":
        return tuple(["and"] + [_conv_inner(c, rule_names) for c in form[1:]])
    return tuple(form)


def _conv_entry(cl, rule_names: frozenset = frozenset()) -> list:
    """One :where entry -> the dict-mirror entry shape."""
    if not isinstance(cl, list) or not cl:
        raise DatalogError(f"unrecognized :where clause {cl!r}")
    if cl[0] in ("not", "or", "not-join", "or-join"):
        # Datomic writes (not ...) / (or ...) directly in :where
        return [_conv_call(cl, rule_names)]
    if _is_plain_symbol(cl[0]):
        # Bare rule invocation `(ancestor ?x ?y)` — the EDN reader
        # flattens the parens, so it arrives shaped like a pattern;
        # the plain-symbol head disambiguates (see module docstring).
        if cl[0] in rule_names:
            return [_conv_call(cl, rule_names)]
        raise DatalogError(
            f"unknown head symbol {cl[0]!r} in :where clause {cl!r} — "
            "not a declared rule name; patterns start with a ?var, "
            "numeric eid, :ident, or $db marker"
        )
    if len(cl) == 1 and isinstance(cl[0], list):
        return [_conv_call(cl[0], rule_names)]  # [(pred ...)] / [(rule ...)]
    if len(cl) == 2 and isinstance(cl[0], list):
        return [_conv_call(cl[0], rule_names), cl[1]]  # [(fn ...) ?out]
    if len(cl) == 2 and not any(isinstance(x, list) for x in cl):
        return list(cl)  # [e a] attribute-presence pattern
    if len(cl) == 3 and not any(isinstance(x, list) for x in cl):
        return list(cl)  # triple pattern
    if (
        4 <= len(cl) <= 6
        and isinstance(cl[0], str)
        and cl[0].startswith("$")
        and not any(isinstance(x, list) for x in cl)
    ):
        if cl[0] == "$":
            # Datomic's explicit primary-db form [$ ?e ?a ?v ...] — same
            # datoms view as the unmarked pattern, marker dropped
            return list(cl[1:])
        if not cl[0][1:].isdigit():
            raise DatalogError(
                f"unsupported db marker {cl[0]!r} in pattern {cl!r} — "
                "named db symbols are not supported; use $ (primary) or "
                "$2-style :in markers"
            )
        return list(cl)  # [$2 e a v ...] db-scoped pattern (multi-db :in)
    if len(cl) in (4, 5) and not any(isinstance(x, list) for x in cl):
        # history-db patterns [e a v tx] / [e a v tx op]
        return list(cl)
    raise DatalogError(f"unrecognized :where clause {cl!r}")


def _conv_inner(c, rule_names: frozenset = frozenset()):
    """Inner clause of not/and: pattern stays a list, a call becomes a
    bare tuple (the compiler re-wraps it)."""
    e = _conv_entry(c, rule_names)
    if len(e) == 1 and isinstance(e[0], tuple):
        return e[0]
    return e


def _conv_leg(c, rule_names: frozenset = frozenset()):
    """(or ...) leg: an (and ...) group, a pattern, or a single call."""
    if isinstance(c, list) and c and c[0] == "and":
        return _conv_call(c, rule_names)
    return _conv_inner(c, rule_names)


def _conv_find(term):
    return tuple(term) if isinstance(term, list) else term


def _conv_in(spec):
    if spec in ("$", "%"):
        return None  # primary db / rules arrive as Python args
    return spec  # scalar str, '$2'-style extra-db marker, or shaped list


def edn_query(text: str, rule_names: frozenset = frozenset()) -> dict:
    """Parse EDN query text (vector or map form) into the compiler's
    dict mirror. `rule_names` are the declared rule heads (from the
    :in % rules argument) so bare `(rule ?a ?b)` invocations compile
    as calls, not triple patterns."""
    form = loads(text)
    sections: dict[str, list] = {}
    if isinstance(form, dict):
        for k, v in form.items():
            sections[k] = v if isinstance(v, list) else [v]
    elif isinstance(form, list):
        key = None
        for item in form:
            if isinstance(item, str) and item in _SECTIONS:
                key = item
                sections[key] = []
                continue
            if isinstance(item, str) and item.startswith(":") and key != ":where":
                raise DatalogError(f"unsupported query section {item}")
            if key is None:
                raise DatalogError(f"query must start with a section keyword: {item!r}")
            sections[key].append(item)
    else:
        raise DatalogError(f"query must be a vector or map form: {form!r}")

    if ":find" not in sections or ":where" not in sections:
        raise DatalogError("query needs :find and :where")

    # Datomic find SPECIFICATIONS: [:find ?x .] scalar, [:find [?x ...]]
    # collection, [:find [?x ?y]] single tuple — the spec shapes how a
    # CLIENT materializes the relation (q_edn_spec); the compiled plan
    # is the same relation either way. A single bracketed group of
    # plain vars is a spec; a parenthesized call like (min ?x) has a
    # non-var head and stays an aggregate term.
    raw_find = list(sections[":find"])
    find_spec = "rel"
    if len(raw_find) >= 2 and raw_find[-1] == ".":
        find_spec = "scalar"
        raw_find = raw_find[:-1]
        if len(raw_find) != 1:
            raise DatalogError("[:find ?x .] takes exactly one find term")
    elif (
        len(raw_find) == 1
        and isinstance(raw_find[0], list)
        and raw_find[0]
        and all(isinstance(x, str) for x in raw_find[0])
        and raw_find[0][0].startswith("?")
    ):
        group = raw_find[0]
        if group[-1] == "...":
            if len(group) != 2:
                raise DatalogError("[:find [?x ...]] takes one var")
            find_spec = "coll"
            raw_find = [group[0]]
        else:
            if not all(x.startswith("?") for x in group):
                raise DatalogError(f"find tuple spec must be vars: {group}")
            find_spec = "tuple"
            raw_find = list(group)

    out: dict = {
        "find": [_conv_find(t) for t in raw_find],
        "where": [_conv_entry(c, rule_names) for c in sections[":where"]],
        "find_spec": find_spec,
    }
    if ":in" in sections:
        out["in"] = [s for s in (_conv_in(x) for x in sections[":in"]) if s is not None]
    if ":with" in sections:
        out["with"] = list(sections[":with"])
    if ":limit" in sections:
        (lim,) = sections[":limit"]
        out["limit"] = lim
    if ":offset" in sections:
        (off,) = sections[":offset"]
        out["offset"] = off
    for sec in (":keys", ":syms", ":strs"):
        if sec in sections:
            # result-map names: symbols / keywords / strings all become
            # the output column names
            out["keys"] = [str(k).lstrip(":") for k in sections[sec]]
            break
    return out


def edn_rules(text: str) -> list:
    """Parse an EDN rule set "[[(name ?a ?b) clause ...] ...]" into the
    compiler's rules shape. Two passes: collect every defined rule name
    first, so recursive bodies may invoke rules bare (`(ancestor ?z
    ?y)`) as well as wrapped (`[(ancestor ?z ?y)]`)."""
    form = loads(text)
    if not isinstance(form, list):
        raise DatalogError(f"rules must be a vector of definitions: {form!r}")
    for rd in form:
        if not isinstance(rd, list) or not rd or not isinstance(rd[0], list):
            raise DatalogError(f"rule needs a (name ?args...) head: {rd!r}")
    names = rule_set_names(form)
    return [
        [tuple(rd[0])] + [_conv_entry(c, names) for c in rd[1:]]
        for rd in form
    ]


def rule_set_names(rules) -> frozenset:
    """Declared rule-head names from either the parsed-EDN shape or the
    compiler's dict-mirror rules shape (both are [[head, clause...]])."""
    names = set()
    for rd in rules or ():
        if isinstance(rd, list) and rd and isinstance(rd[0], (list, tuple)) and rd[0]:
            names.add(rd[0][0])
    return frozenset(names)


def q_edn(
    query: str,
    datoms: DataFrame,
    *params,
    rules: str | None = None,
) -> DataFrame:
    """Run EDN query text against a datoms view. `params` bind :in
    (scalars / collections / tuples / relations as Python values);
    `rules` is EDN rule-set text (the :in % argument)."""
    parsed_rules = edn_rules(rules) if rules is not None else None
    qd = edn_query(query, rule_set_names(parsed_rules))
    if parsed_rules is not None:
        qd["rules"] = parsed_rules
    return q(qd, datoms, *params)


def q_edn_spec(
    query: str,
    datoms: DataFrame,
    *params,
    rules: str | None = None,
):
    """`d/q` with Datomic find-specification materialization:

      [:find ?x ?y]       -> DataFrame (relation, as q_edn)
      [:find ?x .]        -> the single scalar value (None if empty)
      [:find [?x ...]]    -> a Python list of values
      [:find [?x ?y]]     -> one tuple (None if empty)

    Datomic picks an ARBITRARY row for `.` and tuple specs; a
    distributed engine must not — here the relation orders by its
    output columns first, so the scalar/tuple pick is deterministic.
    Scalar/tuple fetch LIMIT 1 (bounded); the collection spec collects
    one column of the full relation — a client materialization, sized
    accordingly (use q_edn for a DataFrame at scale)."""
    parsed_rules = edn_rules(rules) if rules is not None else None
    qd = edn_query(query, rule_set_names(parsed_rules))
    spec = qd.pop("find_spec", "rel")
    if parsed_rules is not None:
        qd["rules"] = parsed_rules
    out = q(qd, datoms, *params)
    if spec == "rel":
        return out
    ordered = out.orderBy(*out.columns)
    if spec == "coll":
        return [r[0] for r in ordered.collect()]
    rows = ordered.limit(1).collect()
    if not rows:
        return None
    return rows[0][0] if spec == "scalar" else tuple(rows[0])
