"""Minimal EDN reader for the reference's data files.

Parses the subset of EDN the mbrainz dataset uses (reference files:
subsets/entities/*.edn, subsets/batches/*.edn): maps, vectors, lists, sets,
strings, numbers, keywords, symbols, booleans, nil, `#uuid` tagged literals,
namespaced-map syntax `#:artist{...}`, and `;` comments. Commas are
whitespace.

Representation choices (documented; used consistently across the engine):
  keyword  -> str  ":ns/name"        (leading colon kept)
  symbol   -> str  "name"
  #uuid    -> str  canonical lowercase uuid text
  map      -> dict
  vector   -> list            list -> list          set -> frozenset

This module is pure Python and is invoked inside Arrow-batched executors
(sources/edn_source.py) — the driver never materializes whole files.
"""

from __future__ import annotations

import uuid as _uuid
from collections.abc import Iterator

_WS = set(" \t\r\n,")
_DELIM = set("()[]{}\";")


class EdnError(ValueError):
    pass


# Internal marker returned by the `#_` discard reader; never escapes this
# module — every consumer of `_read_raw` filters it out.
_DISCARD = object()


class _Reader:
    __slots__ = ("s", "i", "n")

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def _skip_ws(self) -> None:
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c in _WS:
                self.i += 1
            elif c == ";":
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def eof(self) -> bool:
        self._skip_ws()
        return self.i >= self.n

    def read(self):
        form = self._read_raw()
        while form is _DISCARD:
            form = self._read_raw()
        return form

    def _read_raw(self):
        self._skip_ws()
        if self.i >= self.n:
            raise EdnError("unexpected EOF")
        c = self.s[self.i]
        if c == "{":
            return self._read_map(None)
        if c == "[":
            return self._read_seq("]")
        if c == "(":
            return self._read_seq(")")
        if c == '"':
            return self._read_string()
        if c == "#":
            return self._read_dispatch()
        if c == ":":
            return self._read_token()  # keyword, returned with the colon
        return self._read_scalar()

    def _read_seq(self, closer: str) -> list:
        self.i += 1
        out = []
        while True:
            self._skip_ws()
            if self.i >= self.n:
                raise EdnError(f"unterminated sequence, expected {closer!r}")
            if self.s[self.i] == closer:
                self.i += 1
                return out
            item = self._read_raw()
            if item is not _DISCARD:
                out.append(item)

    def _read_map(self, ns: str | None) -> dict:
        self.i += 1  # consume '{'
        out = {}
        while True:
            self._skip_ws()
            if self.i >= self.n:
                raise EdnError("unterminated map")
            if self.s[self.i] == "}":
                self.i += 1
                return out
            k = self._read_raw()
            if k is _DISCARD:
                continue
            v = self._read_raw()
            while v is _DISCARD:
                v = self._read_raw()
            if ns and isinstance(k, str) and k.startswith(":") and "/" not in k:
                k = f":{ns}/{k[1:]}"
            out[_hashable(k)] = v

    def _read_string(self) -> str:
        s = self.s
        i = self.i + 1
        buf = []
        while i < self.n:
            c = s[i]
            if c == "\\":
                if i + 1 >= self.n:
                    # a truncated escape is an unterminated string, not an
                    # IndexError — the chunked parser relies on EdnError to
                    # mean "incomplete, buffer more"
                    raise EdnError("unterminated string")
                nxt = s[i + 1]
                buf.append({"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}.get(nxt, nxt))
                i += 2
            elif c == '"':
                self.i = i + 1
                return "".join(buf)
            else:
                buf.append(c)
                i += 1
        raise EdnError("unterminated string")

    def _read_dispatch(self):
        s = self.s
        if s.startswith("#uuid", self.i):
            self.i += 5
            self._skip_ws()
            val = self._read_string()
            return str(_uuid.UUID(val))
        if s.startswith("#inst", self.i):
            self.i += 5
            self._skip_ws()
            return self._read_string()
        if s.startswith("#{", self.i):
            self.i += 1  # point at '{'
            items = self._read_seq("}")
            return frozenset(_hashable(x) for x in items)
        if s.startswith("#:", self.i):
            # namespaced map: #:artist{:name ...}
            self.i += 2
            start = self.i
            while self.i < self.n and s[self.i] != "{":
                self.i += 1
            ns = s[start : self.i].strip()
            return self._read_map(ns)
        if s.startswith("#_", self.i):  # discard form
            # Consume exactly one real form and contribute nothing; nested
            # discards (`#_ #_ a b`) each consume a further form, matching
            # Clojure reader semantics. A closing delimiter or EOF here is
            # an error, never a silent empty symbol.
            self.i += 2
            form = self._read_raw()
            while form is _DISCARD:
                form = self._read_raw()
            return _DISCARD
        raise EdnError(f"unsupported dispatch at {self.i}: {s[self.i:self.i+10]!r}")

    def _read_token(self) -> str:
        s = self.s
        start = self.i
        i = self.i
        while i < self.n and s[i] not in _WS and s[i] not in _DELIM:
            i += 1
        self.i = i
        return s[start:i]

    def _read_scalar(self):
        tok = self._read_token()
        if tok == "":
            # _read_token stalled on a delimiter: a form was required but a
            # closing bracket/brace (or similar) is next.
            raise EdnError(
                f"expected a form at {self.i}: {self.s[self.i:self.i+10]!r}"
            )
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        return tok  # symbol


def _hashable(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    return v


def loads(text: str):
    """Parse a single EDN form (leading/trailing discards are transparent)."""
    r = _Reader(text)
    out = r.read()
    while not r.eof():
        pos = r.i
        if r._read_raw() is not _DISCARD:
            raise EdnError(f"trailing content at {pos}")
    return out


def iter_forms(text: str) -> Iterator:
    """Iterate top-level EDN forms in a string (streaming, bounded memory
    per form) — the analog of the reference's PushbackReader loop
    (src/cognitect/xform/async_edn.clj:27-51). Discard forms contribute
    nothing."""
    r = _Reader(text)
    while not r.eof():
        form = r._read_raw()
        if form is not _DISCARD:
            yield form


def iter_forms_chunks(chunks) -> Iterator:
    """Iterate top-level EDN forms from an iterator of TEXT CHUNKS —
    the true streaming face of `iter_forms`, for inputs that must never
    be whole in memory (the reference's PushbackReader never holds the
    file either; async_edn.clj:27-51). Memory is bounded by the largest
    single form plus one chunk, not the file.

    Mechanism: incremental try-parse against a rolling buffer with the
    SAME `_Reader` the string path uses (no second lexer to diverge).
    A parse error before end-of-input means "form incomplete — buffer
    more"; at true end-of-input it re-raises, so malformed input stays
    loud. A form that consumes the buffer to its exact end is also
    deferred unless input is exhausted: a trailing scalar token might
    continue in the next chunk ("123" + "456"), and only end-of-input
    certifies it complete. Whitespace/comment tails are kept verbatim
    (a chunk may end mid-comment; dropping the tail would splice the
    next chunk into the comment). A malformed form late in a stream
    buffers the remainder before raising — the error path pays memory,
    the happy path never does."""
    buf = ""
    done = False
    it = iter(chunks)
    while True:
        emitted_to = 0
        r = _Reader(buf)
        while True:
            r.i = emitted_to
            if r.eof():
                if done:
                    emitted_to = len(buf)
                break
            try:
                form = r._read_raw()
            except EdnError:
                if done:
                    raise
                break
            if r.i >= r.n and not done:
                break  # touches buffer end: possibly truncated scalar
            emitted_to = r.i
            if form is not _DISCARD:
                yield form
        buf = buf[emitted_to:]
        if done:
            return
        try:
            buf += next(it)
        except StopIteration:
            done = True
