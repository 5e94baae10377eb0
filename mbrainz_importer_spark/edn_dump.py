"""EDN serializer for the engine's golden-format export (K1 sink).

Inverse of edn.loads under this engine's representation conventions:
strings that look like canonical UUIDs serialize as #uuid literals, strings
with a leading ':' as keywords. Dict keys keep insertion order.
"""

from __future__ import annotations

import re

_UUID_RE = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
# a leading-colon string only serializes as a keyword when it IS a valid
# keyword (hypothesis found ':;' — the ';' would start an EDN comment)
_KEYWORD_RE = re.compile(r"^:[A-Za-z0-9*+!_?<>=.-]+(/[A-Za-z0-9*+!_?<>=.-]+)?$")
_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\t": "\\t", "\r": "\\r"}


def dumps(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        if _KEYWORD_RE.match(v):
            return v
        if _UUID_RE.match(v):
            return f'#uuid "{v}"'
        return '"' + "".join(_ESCAPES.get(c, c) for c in v) + '"'
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, dict):
        return "{" + ", ".join(f"{dumps(k)} {dumps(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + " ".join(dumps(x) for x in v) + "]"
    if isinstance(v, frozenset):
        return "#{" + " ".join(dumps(x) for x in sorted(v, key=repr)) + "}"
    raise TypeError(f"cannot serialize {type(v)}")
