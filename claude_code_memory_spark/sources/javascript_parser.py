"""JavaScript/TypeScript parser (scanner-based, tree-sitter-free).

Reference semantics (S5, analysis/javascript_parser.py:19-1197): functions
(declarations, arrow/function-expression consts, generators, methods),
classes (+extends/+implements, abstract), TS interfaces (:111-121,
:395-436), type aliases and enums, module-level variables with full
destructuring support (:806-1010 — object/array patterns, renames,
defaults, rest, nesting), class fields (:129-131), imports
(default/named/namespace/bare/require/dynamic), decorator relations
(:688-711), exception relations (:664-687), JSON-loading relations
(:486-541), per-function call extraction (:326-336) and complexity
(:337-354), React-component heuristics.

The reference drives tree-sitter; that library is not in this container,
so the same surface is covered by a two-pass scanner: pass 1 masks
comments and string/template bodies (preserving line structure) so pass 2
can track real brace depth, class scopes, and declaration extents with
line-anchored regexes. Runs per-file inside the shared mapInPandas stage.
"""

from __future__ import annotations

import re

# --- pass 1: masking ------------------------------------------------------


def mask_source(src: str) -> str:
    """Replace comment bodies and string/template contents with spaces,
    preserving every newline and column, so structural regexes and brace
    counting never fire inside literals."""
    out = list(src)
    i, n = 0, len(src)
    CODE, LINE, BLOCK, SQ, DQ, TPL = range(6)
    state = CODE
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if state == CODE:
            if c == "/" and nxt == "/":
                state = LINE
                i += 2
                continue
            if c == "/" and nxt == "*":
                state = BLOCK
                out[i] = out[i + 1] = " "
                i += 2
                continue
            if c == "'":
                state = SQ
            elif c == '"':
                state = DQ
            elif c == "`":
                state = TPL
            i += 1
            continue
        if state == LINE:
            if c == "\n":
                state = CODE
            else:
                out[i] = " "
            i += 1
            continue
        if state == BLOCK:
            if c == "*" and nxt == "/":
                state = CODE
                out[i] = out[i + 1] = " "
                i += 2
                continue
            if c != "\n":
                out[i] = " "
            i += 1
            continue
        # string states: mask contents, keep the quotes and newlines
        if c == "\\" and i + 1 < n:
            out[i] = " "
            if src[i + 1] != "\n":
                out[i + 1] = " "
            i += 2
            continue
        if (state == SQ and c == "'") or (state == DQ and c == '"') or (
            state == TPL and c == "`"
        ):
            state = CODE
        elif (state in (SQ, DQ) and c == "\n"):
            state = CODE  # unterminated string: fail open at EOL
        elif c != "\n":
            out[i] = " "
        i += 1
    return "".join(out)


# --- pass 2: structure ----------------------------------------------------

_EXPORT = r"(?:export\s+)?(?:default\s+)?(?:declare\s+)?(?:abstract\s+)?"
_FUNC = re.compile(
    rf"^\s*{_EXPORT}(?:async\s+)?function\s*(\*?)\s*(\w+)\s*(\([^)]*\)?)"
)
_ARROW = re.compile(
    rf"^\s*{_EXPORT}(?:const|let|var)\s+(\w+)(?:\s*:\s*[^=]+)?\s*=\s*"
    r"(?:async\s*)?(?:\([^)]*\)?|\w+)\s*(?::\s*[\w<>,\[\]\s.|&]+)?\s*=>"
)
_FUNC_EXPR = re.compile(
    rf"^\s*{_EXPORT}(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s+)?function\b"
)
_CLASS = re.compile(
    rf"^\s*{_EXPORT}class\s+(\w+)"
    r"(?:\s+extends\s+([\w.]+)(?:<[^>]*>)?)?"
    r"(?:\s+implements\s+([\w.,\s<>]+?))?\s*\{"
)
_INTERFACE = re.compile(
    rf"^\s*{_EXPORT}interface\s+(\w+)(?:<[^>]*>)?"
    r"(?:\s+extends\s+([\w.,\s<>]+?))?\s*\{"
)
_TYPE_ALIAS = re.compile(rf"^\s*{_EXPORT}type\s+(\w+)(?:<[^>]*>)?\s*=")
_ENUM = re.compile(rf"^\s*{_EXPORT}(?:const\s+)?enum\s+(\w+)\s*\{{")
_VAR_DECL = re.compile(
    rf"^\s*{_EXPORT}(?:const|let|var)\s+([^=;]+?)\s*(?:=|;|$)"
)
_ASSIGN = re.compile(r"^\s*(\w+)\s*=\s*[^=]")
_METHOD = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+|abstract\s+"
    r"|override\s+|async\s+|\*\s*|get\s+|set\s+)*(#?\w+|\[[^\]]*\])\s*(?:<[^>]*>)?\s*"
    r"(\([^)]*\)?)\s*(?::\s*[\w<>,\[\]\s.|&{}]+?)?\s*\{"
)
_FIELD = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+"
    r"|declare\s+|override\s+)*(#?\w+)\s*(?:\?|!)?\s*(?::[^=;]+)?(?:=|;)"
)
# a TS field declaration's simple-name type annotation (`db: Database;`
# possibly dotted) — the class-body twin of Python's `db: Database`
# dataclass-style annotation; generics/unions/parens fail the match and
# bind nothing (declared-intent certainty only)
_FIELD_ANN = re.compile(
    r":\s*([\w$]+(?:\.[\w$]+)*)\s*(?:<[^<>]*>)?\s*(?:;|=|$)"
)
_FIELD_NEW = re.compile(r"=\s*new\s+([\w$]+(?:\.[\w$]+)*)\s*\(")
# instance members only: a static field/getter lives on the class, not
# on instances — binding it would wrongly type `s.x` reads
_STATIC_MEMBER = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|readonly\s+|declare\s+"
    r"|abstract\s+|override\s+)*static\s"
)
# non-static getter: `get conn(): Conn {` — a TS getter IS a property;
# marking it with the same (uses, 'property', decorator) row Python's
# @property emits lets the resolver's property-return path apply to
# both languages through one gate
_GETTER = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|abstract\s+|override\s+)*"
    r"get\s+[\w$#]"
)
_IMPORT = re.compile(
    r"^\s*import\s+(?:type\s+)?(?:(\w+)|\{([^}]*)\}|\*\s+as\s+(\w+))?"
    r"\s*(?:,\s*(?:\{([^}]*)\}|\*\s+as\s+(\w+)))?\s*from\s+['\"]([^'\"]+)['\"]"
)
_BARE_IMPORT = re.compile(r"^\s*import\s+['\"]([^'\"]+)['\"]")
_EXPORT_FROM = re.compile(
    r"^\s*export\s+(?:type\s+)?(?:\*(?:\s+as\s+\w+)?|\{[^}]*\})\s*"
    r"from\s+['\"]([^'\"]+)['\"]"
)
_REQUIRE = re.compile(
    r"(?:const|let|var)\s+(\{[^}]*\}|\w+)\s*=\s*require\s*\(\s*['\"]([^'\"]+)['\"]"
)


def _spec_to_module(path: str, spec: str) -> str | None:
    """Relative import specifier → dotted module in the path-derived
    namespace operators/resolve.py joins on: from ``src/app.js``,
    ``./lib/util`` → ``src.lib.util``; ``../x`` → ``x``; ``./lib`` may
    be the package entry ``lib/index.js`` whose module IS ``src.lib``
    (module_of_path strips the index segment symmetrically). Bare
    package specifiers ('react') are external → None."""
    if not spec.startswith("."):
        return None
    import posixpath

    p = posixpath.normpath(posixpath.join(posixpath.dirname(path), spec))
    if p.startswith(".."):
        return None  # escapes the project root — unresolvable
    p = re.sub(r"\.(js|jsx|ts|tsx|mjs|cjs)$", "", p)
    p = re.sub(r"(^|/)index$", r"", p).rstrip("/")
    return p.replace("/", ".")
_DYNAMIC_IMPORT = re.compile(r"\bimport\s*\(\s*['\"]([^'\"]+)['\"]")
_DEFAULT_EXPORT = re.compile(r"^\s*export\s+default\s")
_DECORATOR = re.compile(r"^\s*@(\w+)")
# leading decorator incl. a single-line argument list, for stripping
# inline decorators off the member they annotate
_DECORATOR_PREFIX = re.compile(r"^\s*@(\w+)(?:\s*\([^)]*\))?[ \t]*")
_THROW = re.compile(r"\bthrow\s+new\s+(\w+)")
_JSON_LOAD = re.compile(
    r"\b(?:fetch|require|import)\s*\(\s*['\"]([^'\"]+\.json)['\"]"
)
# optional dotted base before the callee: `ns.util.f(` → base 'ns.util',
# callee 'f' — the base feeds cross-file resolution (operators/resolve.py)
_CALL = re.compile(r"(?:\b([\w$]+(?:\.[\w$]+)*)\s*\.\s*)?\b([\w$]+)\s*\(")
# every ")<dot>name(" link — a method call on a call RESULT; the marker
# for each link is built by _marker_before's balanced-paren backward
# scan (verdict r8 item 2: the old paren-free regex dropped `a(f(x)).b()`
# and the later links of `a().b().c()` to bare-call rows)
_CHAIN_LINK = re.compile(r"\)\s*\.\s*([\w$]+)\s*\(")
# Chained-coverage accounting (advice r7): the parser tallies (links
# seen, links captured) per process; `chain_coverage()` reads it,
# `reset_chain_coverage()` zeroes it. With the r9 balanced-paren scan
# the residual gap is only the genuinely unmarkable shapes (subscripted
# bases, parenthesized expressions, chains past the 3-link marker cap —
# the same shapes the Python AST marker returns None for).
_CHAIN_STATS = {"links": 0, "captured": 0}


def _balanced_close(s: str, i: int) -> int:
    """Index of the ')' closing the '(' at ``s[i]``, or -1. ``s`` is
    MASKED text (strings/comments blanked), so parens balance."""
    bal = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "(":
            bal += 1
        elif c == ")":
            bal -= 1
            if bal == 0:
                return i
        i += 1
    return -1


_NAME_CHAIN_END = re.compile(r"[\w$]+(?:\s*\.\s*[\w$]+)*$")
_NEXT_LINK = re.compile(r"\s*\.\s*([\w$]+)\s*\(")


def _marker_before(s: str, j: int, depth: int = 3) -> str | None:
    """Synthetic marker for the call expression whose closing paren is
    ``s[j]`` — the regex twin of python_parser._marker_of_call:
    `makeTool(...)` → 'makeTool()', `a.b.c(...)` → 'a.b.c()',
    `a(...).b(...)` → 'a().b()' (recursive on the call-result link,
    depth-capped at 3 like the Python marker). Walks the balanced
    argument list backward over MASKED text, so nested parens in the
    arguments (`a(f(x)).b()`) don't defeat it — the argument list is
    irrelevant to the result type. Returns None for anything that is
    not a plain name chain over call links (subscripts, parenthesized
    expressions, curried calls): unresolved beats guessed."""
    if depth <= 0 or j < 0 or s[j] != ")":
        return None
    bal = 0
    i = j
    while i >= 0:
        c = s[i]
        if c == ")":
            bal += 1
        elif c == "(":
            bal -= 1
            if bal == 0:
                break
        i -= 1
    if i < 0:
        return None
    k = i - 1
    while k >= 0 and s[k].isspace():
        k -= 1
    m = _NAME_CHAIN_END.search(s, 0, k + 1)
    if m is None:
        return None
    chain = re.sub(r"\s+", "", m.group(0))
    start = m.start()
    p = start - 1
    sp = False
    while p >= 0 and s[p].isspace():
        p -= 1
        sp = True
    if p >= 0 and s[p] == ".":
        # the chain hangs off another expression; only a direct call
        # RESULT (`a(...).b(...)`) is markable, and only for a
        # single-name link — the Python AST path bails on everything
        # else (attribute-of-attribute over a call, subscripts)
        q = p - 1
        while q >= 0 and s[q].isspace():
            q -= 1
        if q >= 0 and s[q] == ")" and "." not in chain:
            inner = _marker_before(s, q, depth - 1)
            if inner is not None:
                return f"{inner}.{chain}()"
        return None
    if (
        sp
        and p >= 2
        and s[p - 2 : p + 1] == "new"
        and (p - 3 < 0 or not (s[p - 3].isalnum() or s[p - 3] in "_$"))
    ):
        # `new Tool(...)` marks as 'Tool()' — the ctor result IS the
        # instance, same as the Python ast.Call marker
        return chain + "()"
    if not sp and p >= 0 and (s[p].isalnum() or s[p] in "_$"):
        return None  # glued word — not a clean chain boundary
    return chain + "()"


def _chain_value(s: str, head: str, open_idx: int) -> str:
    """Effective ctor string for a type bind whose value starts with
    ``head(`` at ``open_idx``: ``head`` itself when the call is
    unchained, ``'head()[.mid()].last'`` (a marker base the resolver's
    call-result typing consumes) when chained — the regex twin of
    python_parser.call_val's chained branch — or '__poisoned__' when
    the chain is unmarkable (unterminated, or deeper than the 3-link
    marker cap): unresolved beats guessed."""
    close = _balanced_close(s, open_idx)
    if close < 0:
        return "__poisoned__"
    links: list[str] = []
    pos = close + 1
    while True:
        m = _NEXT_LINK.match(s, pos)
        if not m:
            break
        nxt = _balanced_close(s, m.end() - 1)
        if nxt < 0:
            return "__poisoned__"
        links.append(m.group(1))
        pos = nxt + 1
    if not links:
        return head
    if len(links) > 3:  # base marker would exceed the 3-call-link cap
        return "__poisoned__"
    marker = head + "()" + "".join(f".{nm}()" for nm in links[:-1])
    return f"{marker}.{links[-1]}"


def chain_coverage() -> dict[str, int]:
    """(links, captured) chained-call tallies since the last reset; the
    gap is the count of chain links conservatively demoted to bare-call
    rows (kept unresolved rather than wrongly resolved)."""
    return dict(_CHAIN_STATS)


def reset_chain_coverage() -> None:
    _CHAIN_STATS["links"] = 0
    _CHAIN_STATS["captured"] = 0
# instance-typed resolution raw material (the regex twin of
# python_parser._collect_type_binds): `const x = new C()` binds x→C,
# `this.db = new C()` binds at class scope; any reassignment poisons
_NEW_ASSIGN = re.compile(
    r"(?<![.\w$])(?:const\s+|let\s+|var\s+)?([\w$]+)"
    r"\s*(?::\s*[\w$.<>\[\], |&]+)?=\s*new\s+([\w$]+(?:\.[\w$]+)*)"
)
_ANY_ASSIGN = re.compile(
    r"(?<![.\w$])(?:const\s+|let\s+|var\s+)?([\w$]+)"
    r"\s*(?::\s*[\w$.<>\[\], |&]+)?=(?![=>])"
)
_THIS_NEW = re.compile(
    r"\bthis\.([\w$]+)\s*=\s*new\s+([\w$]+(?:\.[\w$]+)*)"
)
_THIS_ASSIGN = re.compile(r"\bthis\.([\w$]+)\s*=(?![=>])")
# plain call assignment (`const t = makeTool()`) — the Python parser
# binds ANY call value; here the callee may be a factory function whose
# return_bind types the var downstream (non-factory callees simply
# match nothing in the resolver)
_CALL_ASSIGN = re.compile(
    r"(?<![.\w$])(?:const\s+|let\s+|var\s+)?([\w$]+)"
    r"\s*(?::\s*[\w$.<>\[\], |&]+)?=\s*(await\s+)?([\w$]+(?:\.[\w$]+)*)\s*\("
)


def _local_type_binds(body: str) -> dict[str, str]:
    """var → dotted ctor for vars assigned exactly one ``new C()`` (or
    one plain call — the factory pattern) and never reassigned in this
    body — a join hit downstream is a certainty, not a guess."""
    news: dict[str, set[str]] = {}
    for m in _NEW_ASSIGN.finditer(body):
        # `new Tool().getEngine()` must NOT bind to Tool — the value is
        # the chain result; _chain_value rebinds through the marker (or
        # poisons an unmarkable chain), the call_val twin
        val = m.group(2)
        pos = m.end()
        while pos < len(body) and body[pos].isspace():
            pos += 1
        if pos < len(body) and body[pos] == "(":
            val = _chain_value(body, m.group(2), pos)
        news.setdefault(m.group(1), set()).add(val)
    for m in _CALL_ASSIGN.finditer(body):
        callee = m.group(3)
        if callee.split(".")[0] in _CALL_KEYWORDS:
            continue  # require(, import(, await(, if(, ...
        val = _chain_value(body, callee, m.end() - 1)
        if m.group(2):
            # `x = await f()`: the awaited marker rides the value string
            # through the merge/poison logic (awaited vs non-awaited
            # same-callee binds genuinely differ -> poison) and is
            # stripped into the bind's awaited flag at emission
            val = "await " + val
        news.setdefault(m.group(1), set()).add(val)
    counts: dict[str, int] = {}
    for m in _ANY_ASSIGN.finditer(body):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return {
        v: next(iter(c))
        for v, c in news.items()
        if len(c) == 1 and counts.get(v, 0) <= 1 and v not in _CALL_KEYWORDS
    }


_THIS_CALL = re.compile(
    r"\bthis\.([\w$]+)\s*=\s*(await\s+)?([\w$]+(?:\.[\w$]+)*)\s*\("
)


def _this_type_binds(body: str) -> dict[str, str | None]:
    """'this.attr' → ctor (or None = poisoned) for every this-attribute
    assigned in this body; the caller merges across a class's methods.
    Plain call values participate like locals do (`this.db = makeDb()`
    types through the callee's return_bind when it is a factory)."""
    news: dict[str, set[str]] = {}
    for m in _THIS_NEW.finditer(body):
        # chain-aware, same as the local collector: `this.e = new
        # Tool().getEngine()` binds through the marker, not to Tool
        val = m.group(2)
        pos = m.end()
        while pos < len(body) and body[pos].isspace():
            pos += 1
        if pos < len(body) and body[pos] == "(":
            val = _chain_value(body, m.group(2), pos)
        news.setdefault(m.group(1), set()).add(val)
    for m in _THIS_CALL.finditer(body):
        callee = m.group(3)
        if callee.split(".")[0] in _CALL_KEYWORDS:
            continue
        val = _chain_value(body, callee, m.end() - 1)
        if m.group(2):
            val = "await " + val
        news.setdefault(m.group(1), set()).add(val)
    out: dict[str, str | None] = {}
    for m in _THIS_ASSIGN.finditer(body):
        v = m.group(1)
        c = news.get(v, set())
        cnt = out.get(f"this.{v}", "__unseen__")
        one = next(iter(c)) if len(c) == 1 else None
        # second assignment (or non-new / multi-ctor) poisons
        out[f"this.{v}"] = one if cnt == "__unseen__" else None
    return out
# factory pattern (JS twin of python_parser._function_return_bind):
# every `return` in the (masked) body is `return new C(...)` with the
# same C. Bare returns (undefined), non-new values, differing ctors, or
# a yield anywhere poison the function — masked-scan approximation:
# returns of nested closures are attributed to the enclosing function,
# where the divergence rule almost always poisons them (documented
# trade of the regex design).
_RETURN_STMT = re.compile(r"\breturn\b[ \t]*([^;\n]*)")
_RETURN_NEW = re.compile(r"^new\s+([\w$]+(?:\.[\w$]+)*)\s*\(")


# TS annotations, conservatively: a parameter `t: Tool` (optionally
# `t?:`) whose type is a plain dotted name — or, since round 11, a
# single-level generic instantiation `r: Repo<User>`, which binds the
# HEAD class (methods live on Repo regardless of the type argument;
# the element type is NOT bound). Unions (`Tool | null`) and nested
# generics still fail the match and bind nothing.
_PARAM_ANN = re.compile(
    r"([\w$]+)\??\s*:\s*([\w$]+(?:\.[\w$]+)*)\s*(?:<([^<>]*)>)?\s*(?=[,)=])"
)
_SIG_RET = re.compile(r"\)\s*:\s*([\w$]+(?:\.[\w$]+)*)\s*(?:<[^<>]*>)?\s*$")
# `): Promise<Conn>` — the async factory's declared value type; the
# awaited bind receives the T, so the return_bind carries T + is_async
_SIG_RET_PROMISE = re.compile(
    r"\)\s*:\s*Promise\s*<\s*([\w$]+(?:\.[\w$]+)*)\s*>\s*$"
)
_TS_BUILTIN_TYPES = frozenset(
    "string number boolean any unknown void never object symbol bigint".split()
)
# interface member METHOD signature: `ignite(): number;` / `get?<T>(k)`
_IFACE_METHOD = re.compile(r"^\s*(?:readonly\s+)?([\w$]+)\??\s*(?:<[^>]*>)?\s*\(")


def _function_return_bind(body: str) -> tuple[str, str | None] | None:
    if re.search(r"\byield\b", body):
        return None
    seen: tuple[str, str | None] | None = None
    any_ret = False
    for m in _RETURN_STMT.finditer(body):
        expr = m.group(1).strip()
        if not expr:
            return None  # bare return → undefined
        any_ret = True
        nm = _RETURN_NEW.match(expr)
        if nm is None:
            return None
        # `return new C(...).x(...)` is the CHAIN result, not a C — a
        # single-line balanced close followed by '.' poisons the factory
        close = _balanced_close(expr, nm.end() - 1)
        if close >= 0 and expr[close + 1 :].lstrip().startswith("."):
            return None
        base, _, name = nm.group(1).rpartition(".")
        val = (name, base or None)
        if seen is None:
            seen = val
        elif seen != val:
            return None
    return seen if any_ret else None


_CALL_KEYWORDS = frozenset(
    "if for while switch catch function return new typeof await import require "
    "super constructor".split()
)
_COMPLEXITY = re.compile(r"\bif\b|\bfor\b|\bwhile\b|\bcase\b|\bcatch\b|&&|\|\||\?")


def _complexity(body: str) -> int:
    return 1 + len(_COMPLEXITY.findall(body))


def _destructured_names(pattern: str) -> list[str]:
    """Individual bound names from a declaration pattern: identifiers,
    {a, b: c, d = 1, ...rest, nested: {x}}, [x, , y, ...z] — the
    reference's recursive pattern walk (:909-1010) on the pattern text."""
    pattern = pattern.strip()
    if not pattern:
        return []
    if re.fullmatch(r"\w+(?:\s*:\s*[\w<>,\[\]\s.|&{}]+)?", pattern):
        return [pattern.split(":")[0].strip()]
    if pattern[0] not in "{[":
        m = re.match(r"^(\w+)", pattern)
        return [m.group(1)] if m else []
    inner, depth = pattern[1:-1] if pattern[-1] in "}]" else pattern[1:], 0
    parts, buf = [], []
    for ch in inner:
        if ch in "{[(":
            depth += 1
        elif ch in "}])":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    names: list[str] = []
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if part.startswith("..."):
            names.extend(_destructured_names(part[3:]))
            continue
        part = part.split("=")[0].strip()  # strip defaults
        if ":" in part and not part.startswith(("{", "[")):
            # rename or nested: {key: target} — bind the TARGET side
            _, _, target = part.partition(":")
            names.extend(_destructured_names(target.strip()))
        elif part.startswith(("{", "[")):
            names.extend(_destructured_names(part))
        else:
            m = re.match(r"^(#?\w+)", part)
            if m:
                names.append(m.group(1))
    return names


def _strip_decl_generics(line: str) -> str:
    """Remove balanced type-parameter lists (``ident<...>``) from a masked
    declaration line so the structure regexes see the grammar-level shape:
    ``function transform<T extends Map<string, Array<number>>>(x)`` →
    ``function transform(x)``; ``class Repo<K, V> extends Base<Map<K, V>>``
    → ``class Repo extends Base``. A regex can't balance nesting — this
    scanner can (reference handles it via the tree-sitter grammar,
    analysis/javascript_parser.py:19+; this is the two-pass-scanner
    equivalent).

    Conservative on purpose: only an ``<`` immediately after an identifier
    (no space — comparisons are written ``a < b``) opens a candidate run,
    and the run is dropped only if it closes on the same line and contains
    no statement-level characters (``;``, ``&&``, ``||``) — so loop
    conditions like ``i<n;`` survive untouched."""
    out = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "<" and out and (out[-1].isalnum() or out[-1] == "_"):
            depth, j = 1, i + 1
            ok = False
            while j < n:
                ch = line[j]
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                    if depth == 0:
                        ok = True
                        break
                elif ch == ";" or line[j : j + 2] in ("&&", "||"):
                    break
                j += 1
            if ok:
                i = j + 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _end_of_paren_body(masked_lines: list[str], start_idx: int, from_col: int) -> int:
    """Extent of a parenthesized arrow body — ``const C = (...) => (`` —
    by counting parens from the first ``(`` at/after ``from_col``. JSX
    component bodies are almost always this shape; brace counting sees
    only the interpolation braces and truncates the extent to one line."""
    pos = masked_lines[start_idx].find("(", from_col)
    i = start_idx
    if pos < 0:
        for i in range(start_idx + 1, min(start_idx + 3, len(masked_lines))):
            if masked_lines[i].lstrip().startswith("("):
                pos = masked_lines[i].find("(")
                break
        else:
            return start_idx
    depth = 0
    for j in range(i, len(masked_lines)):
        seg = masked_lines[j][pos:] if j == i else masked_lines[j]
        for ch in seg:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return j
    return len(masked_lines) - 1


def _end_of_block(masked_lines: list[str], start_idx: int) -> int:
    """Line index (0-based) of the close of the body block of the
    declaration starting at start_idx. The body opener is the LAST '{' on
    the declaration line (param-list destructuring braces like
    `function f({a, b}) {` open and close before it), else the first '{'
    on a following line."""
    pos = masked_lines[start_idx].rfind("{")
    i = start_idx
    if pos < 0:
        # Allman-style body: only a line that OPENS with '{' counts —
        # otherwise an expression-bodied arrow would swallow the next
        # declaration's block
        for i in range(start_idx + 1, min(start_idx + 3, len(masked_lines))):
            if masked_lines[i].lstrip().startswith("{"):
                pos = masked_lines[i].find("{")
                break
        else:
            return start_idx
    depth = 0
    for j in range(i, len(masked_lines)):
        seg = masked_lines[j][pos:] if j == i else masked_lines[j]
        for ch in seg:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return j
    return len(masked_lines) - 1


def parse_javascript_source(path: str, source: str) -> list[dict]:
    from claude_code_memory_spark.sources.python_parser import (
        _entity_rec,
        _impl_rec,
        _relation_rec,
        _type_bind_rec,
    )

    recs: list[dict] = []
    lines = source.splitlines()
    masked = mask_source(source).splitlines()
    # keep the two views aligned even on trailing-newline edge cases
    while len(masked) < len(lines):
        masked.append("")
    n_lines = len(lines) or 1
    is_ts = path.endswith((".ts", ".tsx"))
    recs.append(
        _entity_rec(
            path, "file", path, 1, n_lines,
            [("TypeScript" if is_ts else "JavaScript") + f" file {path}"],
        )
    )

    # JSON-loading patterns are file-level relations (reference
    # _extract_json_loading_patterns, :486-541): one pass over the whole
    # source, not per-scope, so loads inside skipped function bodies count
    for jf in sorted(set(_JSON_LOAD.findall(source))):
        recs.append(_relation_rec(path, jf, "uses", path))

    def add_entity(name, etype, line_no, end_no, obs, sig=None, parent=None):
        recs.append(_entity_rec(name, etype, path, line_no, end_no, obs, sig=sig))
        recs.append(_relation_rec(parent or path, name, "contains", path))

    def add_impl(name, etype, i0, i1):
        body = "\n".join(lines[i0 : i1 + 1])
        recs.append(_impl_rec(name, etype, path, i0 + 1, i1 + 1, body, _complexity(body)))
        return body

    def add_calls(owner, masked_body):
        seen = set()
        # a method's own declaration line (`go() {`) matches _CALL;
        # excluding the owner's last segment drops it — and self-
        # recursion with it, matching the Python parser's
        # `callee != fn.name` rule exactly
        own = owner.rpartition(".")[2]
        # chained markers first: a method call on a call RESULT would
        # otherwise emit as a bare call; record the method-token offsets
        # so the _CALL pass below skips exactly those occurrences
        # (one row per site, marker wins)
        chain_pos: set[int] = set()
        chained: list[tuple[str, str]] = []
        for m in _CHAIN_LINK.finditer(masked_body):
            _CHAIN_STATS["links"] += 1
            callee = m.group(1)
            # balanced-paren backward scan: `a(f(x)).b()` and the later
            # links of `a().b().c()` all get markers now (verdict r8
            # item 2); None = genuinely unmarkable, bare-call fallback
            marker = _marker_before(masked_body, m.start())
            if marker is None:
                continue
            # a based call named like the owner is NOT self-recursion —
            # chained `make().render()` inside render() is a real edge
            # (same rule as the Python parser)
            if (
                marker.split("(", 1)[0].split(".")[0] in _CALL_KEYWORDS
                or callee in _CALL_KEYWORDS
            ):
                continue
            chain_pos.add(m.start(1))
            chained.append((callee, marker))
            _CHAIN_STATS["captured"] += 1
        for m in _CALL.finditer(masked_body):
            base, callee = m.group(1), m.group(2)
            if m.start(2) in chain_pos:
                continue  # superseded by the chained-marker row
            if (
                callee not in _CALL_KEYWORDS
                and (base is not None or (callee != owner and callee != own))
                and (callee, base) not in seen
            ):
                seen.add((callee, base))
                rec = _relation_rec(owner, callee, "calls", path)
                rec["content"] = base  # dotted call base for resolution
                recs.append(rec)
        for callee, marker in chained:
            if (callee, marker) not in seen:
                seen.add((callee, marker))
                rec = _relation_rec(owner, callee, "calls", path)
                rec["content"] = marker
                recs.append(rec)

    this_binds: dict[str, dict[str, str | None]] = {}  # class → attr binds

    def add_return_bind(name, masked_body, sig_text=None, typeparam=None):
        # a plain-name TS return annotation (`function make(): Tool`)
        # is declared intent and wins over body inference; a
        # `Promise<Tool>` annotation unwraps to Tool with is_async set
        # (the AWAITED value is the instance); other wrapped types
        # (Tool | null) fail the match and fall back to body inference
        rb = None
        is_async = bool(sig_text and re.search(r"\basync\b", sig_text))
        if sig_text:
            # Promise FIRST: the generic-extended _SIG_RET would match
            # `): Promise<Conn>` with head Promise, losing the unwrap
            mp = _SIG_RET_PROMISE.search(sig_text)
            if mp is not None:
                base, _, nm = mp.group(1).rpartition(".")
                rb = (nm, base or None)
                is_async = True  # a Promise value types only awaited
            else:
                ms = _SIG_RET.search(sig_text)
                if ms is not None:
                    base, _, nm = ms.group(1).rpartition(".")
                    if typeparam is not None and not base and nm == typeparam:
                        # `get(): T` where T is the class's single type
                        # param — the value is the bind's type argument
                        rb = ("__typeparam__", None)
                    else:
                        rb = (nm, base or None)
        if rb is None:
            rb = _function_return_bind(masked_body)
        if rb is not None:
            r = _relation_rec(name, rb[0], None, path)
            r["record_kind"] = "return_bind"
            r["content"] = rb[1]
            if is_async:
                # matched against the consumer bind's awaited flag: a
                # non-awaited call of an async factory is a Promise and
                # must not type the variable
                r["import_type"] = "async"
            recs.append(r)

    def add_param_binds(scope, sig_text, masked_body):
        """TS parameter annotations (`function f(t: Tool)`) bind like
        Python's annotated params — declared intent; any body
        assignment to the param poisons it (mirrors the Python rule).
        Union/generic/complex types fail the conservative match."""
        o = sig_text.find("(")
        c = sig_text.find(")", o) if o >= 0 else -1
        if o < 0 or c < 0:
            return
        assigned = {m.group(1) for m in _ANY_ASSIGN.finditer(masked_body)}
        for m in _PARAM_ANN.finditer(sig_text[o : c + 1]):
            var, typ, targs = m.group(1), m.group(2), m.group(3)
            if var in assigned or typ.split(".")[0] in _TS_BUILTIN_TYPES:
                continue
            base, _, nm = typ.rpartition(".")
            targ = None
            if targs is not None and re.fullmatch(r"[\w$]+", targs.strip()):
                targ = targs.strip()  # single plain-name type argument
            recs.append(
                _type_bind_rec(scope, var, nm, base or None, path, targ=targ)
            )

    def add_type_binds(scope, masked_body, cls=None):
        for var, ctor in sorted(_local_type_binds(masked_body).items()):
            awaited = ctor.startswith("await ")
            if awaited:
                ctor = ctor[len("await ") :]
            base, _, name = ctor.rpartition(".")
            recs.append(
                _type_bind_rec(scope, var, name, base or None, path, awaited)
            )
        if cls is not None:
            d = this_binds.setdefault(cls, {})
            for var, ctor in _this_type_binds(masked_body).items():
                if var in d and d[var] != ctor:
                    d[var] = None  # two methods pin different ctors
                elif var not in d:
                    d[var] = ctor

    class_stack: list[tuple[str, int]] = []  # (name, entry depth)
    class_typeparams: dict[str, str] = {}  # class → its single type param
    toplevel_masked: list[str] = []  # module-scope lines, for module binds
    depth = 0
    pending_decorators: list[str] = []
    i = 0
    while i < len(lines):
        raw, msk = lines[i], masked[i]
        # declaration view: type-parameter lists stripped so nested
        # generics (`transform<T extends Map<string, Array<number>>>`)
        # don't defeat the shape regexes; msk keeps the original text for
        # extents/depth accounting
        dmsk = _strip_decl_generics(msk) if "<" in msk else msk
        line_no = i + 1
        in_class = class_stack[-1][0] if class_stack else None
        class_depth = class_stack[-1][1] if class_stack else -1
        if depth == 0 and in_class is None:
            # function/class bodies are consumed wholesale below, so the
            # surviving depth-0 lines ARE the module scope
            toplevel_masked.append(msk)

        dm = _DECORATOR.match(msk)
        if dm:
            # strip every leading `@name` / `@name(args)` prefix, then fall
            # through with the REMAINDER as the declaration: decorators on
            # the same line as the member (`@memoize get value() {…}`) must
            # not swallow the member itself
            rest_m, rest_d = msk, dmsk
            while True:
                pm = _DECORATOR_PREFIX.match(rest_m)
                if not pm:
                    break
                pending_decorators.append(pm.group(1))
                rest_m = rest_m[: pm.start()] + " " * (pm.end() - pm.start()) + rest_m[pm.end():]
                rest_d = _strip_decl_generics(rest_m) if "<" in rest_m else rest_m
            if not rest_m.strip():
                depth += msk.count("{") - msk.count("}")
                i += 1
                continue
            msk, dmsk = rest_m, rest_d

        def consume_decorators(target):
            while pending_decorators:
                deco = pending_decorators.pop()
                recs.append(_relation_rec(target, deco, "uses", path, "decorator"))

        matched = False

        m = _CLASS.match(dmsk)
        if m:
            name, base, implements = m.group(1), m.group(2), m.group(3)
            end = _end_of_block(masked, i)
            obs = [f"Class {name}"]
            if base and "Component" in base:
                obs.append("React class component")
            if "abstract" in msk.split("class")[0]:
                obs.append("Abstract class")
            if "export" in msk.split("class")[0]:
                obs.append("Exported")
            add_entity(name, "class", line_no, end + 1, obs)
            add_impl(name, "class", i, end)
            consume_decorators(name)
            if _DEFAULT_EXPORT.match(msk):
                # named default export: the module's '__default__' is this
                # class (anonymous defaults emit nothing — unresolved
                # beats guessed)
                b = _relation_rec(name, "", "import_binding", path, "default_export")
                b["record_kind"] = "import_binding"
                recs.append(b)
            if base:
                # single `extends` base: position 0 (the python parser
                # emits base-list positions the same way — the resolver's
                # equal-depth diamond tie-break reads them from content)
                r = _relation_rec(name, base.split(".")[-1], "inherits", path)
                r["content"] = "0"
                recs.append(r)
            if implements:
                for iface in implements.split(","):
                    iface = re.sub(r"<.*", "", iface).strip()
                    if iface:
                        recs.append(_relation_rec(name, iface, "implements", path))
            # single declared type parameter (`class Repo<T>` → 'T'):
            # methods returning exactly T emit the __typeparam__
            # sentinel the resolver substitutes with the bind's type
            # argument; multi-param classes (comma fails the match)
            # emit nothing (round 11)
            tp = re.search(
                rf"class\s+{re.escape(name)}\s*<\s*([\w$]+)\s*>", msk
            )
            if tp:
                class_typeparams[name] = tp.group(1)
            class_stack.append((name, depth))
            # enter the class body: continue scanning inside it
            depth += msk.count("{") - msk.count("}")
            i += 1
            continue

        m = _INTERFACE.match(dmsk)
        if m and is_ts:
            name, extends = m.group(1), m.group(2)
            end = _end_of_block(masked, i)
            obs = [f"TypeScript interface: {name}"]
            if "export" in msk.split("interface")[0]:
                obs.append("Exported")
            add_entity(name, "interface", line_no, end + 1, obs)
            add_impl(name, "interface", i, end)
            # member METHOD signatures become entities (`Engine.ignite`)
            # so an interface-typed parameter's calls resolve to the
            # declaration — what TS itself resolves to; property fields
            # and call/construct signatures are skipped
            for j in range(i + 1, end + 1):
                mm = _IFACE_METHOD.match(masked[j])
                if mm and mm.group(1) not in _CALL_KEYWORDS | {"new", "readonly"}:
                    mq = f"{name}.{mm.group(1)}"
                    add_entity(
                        mq, "method", j + 1, j + 1,
                        [f"Interface method {mm.group(1)}"], parent=name,
                    )
            if extends:
                for bpos, iface in enumerate(extends.split(",")):
                    iface = re.sub(r"<.*", "", iface).strip()
                    if iface:
                        # interface extends-list position, same contract
                        # as the class-base positions above
                        r = _relation_rec(name, iface, "inherits", path)
                        r["content"] = str(bpos)
                        recs.append(r)
            depth += sum(r.count("{") - r.count("}") for r in masked[i : end + 1])
            i = end + 1
            continue

        m = _ENUM.match(dmsk)
        if m and is_ts:
            name = m.group(1)
            end = _end_of_block(masked, i)
            add_entity(name, "enum", line_no, end + 1, [f"TypeScript enum: {name}"])
            add_impl(name, "enum", i, end)
            depth += sum(r.count("{") - r.count("}") for r in masked[i : end + 1])
            i = end + 1
            continue

        m = _TYPE_ALIAS.match(dmsk)
        if m and is_ts:
            name = m.group(1)
            add_entity(name, "type_alias", line_no, line_no, [f"TypeScript type alias: {name}"])
            depth += msk.count("{") - msk.count("}")
            i += 1
            continue

        m = _FUNC.match(dmsk)
        if m and (in_class is None or depth <= class_depth):
            star, name, params = m.group(1), m.group(2), m.group(3)
            end = _end_of_block(masked, i)
            obs = [f"Function {name}"]
            if star:
                obs.append("Generator function")
            if "export" in msk.split("function")[0]:
                obs.append("Exported")
            if _DEFAULT_EXPORT.match(msk):
                b = _relation_rec(name, "", "import_binding", path, "default_export")
                b["record_kind"] = "import_binding"
                recs.append(b)
            body = "\n".join(masked[i : end + 1])
            if name[0].isupper() and re.search(r"<\w", body):
                obs.append("React component")
            sig = msk.strip().split("{")[0].strip()
            add_entity(name, "function", line_no, end + 1, obs, sig=sig)
            add_impl(name, "function", i, end)
            add_calls(name, body)
            add_type_binds(name, body)
            add_param_binds(name, sig, body)
            add_return_bind(name, body, sig)
            consume_decorators(name)
            for t in set(_THROW.findall(body)):
                recs.append(_relation_rec(name, t, "throws", path))
            depth += sum(r.count("{") - r.count("}") for r in masked[i : end + 1])
            i = end + 1
            continue

        m = _ARROW.match(dmsk) or _FUNC_EXPR.match(dmsk)
        if m and (in_class is None or depth <= class_depth):
            name = m.group(1)
            # parenthesized arrow body — `const C = (...) => (` — is the
            # standard JSX-component shape; brace counting only sees the
            # interpolation braces and truncates the extent to one line,
            # so count parens from the body opener instead
            arrow_col = msk.find("=>")
            after = msk[arrow_col + 2 :].lstrip() if arrow_col >= 0 else ""
            if arrow_col >= 0 and (after.startswith("(") or after == ""):
                body_probe = after or "".join(
                    masked[j].lstrip()[:1] for j in range(i + 1, min(i + 2, len(masked)))
                )
                if body_probe.startswith("("):
                    end = _end_of_paren_body(masked, i, arrow_col + 2)
                else:
                    end = _end_of_block(masked, i)
            else:
                end = _end_of_block(masked, i)
            obs = [f"Function {name}"]
            if "export" in msk.split(name)[0]:
                obs.append("Exported")
            body = "\n".join(masked[i : end + 1])
            if name[0].isupper() and re.search(r"<\w", body):
                obs.append("React component")
            sig = msk.strip().split("=>")[0].strip()
            add_entity(name, "function", line_no, end + 1, obs, sig=sig)
            add_impl(name, "function", i, end)
            add_calls(name, body)
            add_type_binds(name, body)
            # implicit-return arrow: `const make = () => new Tool()` has
            # no `return` keyword — the expression after => IS the value
            arrow_col2 = msk.find("=>")
            impl_expr = msk[arrow_col2 + 2 :].strip() if arrow_col2 >= 0 else ""
            im = _RETURN_NEW.match(impl_expr)
            if im is not None:
                ibase, _, iname = im.group(1).rpartition(".")
                r = _relation_rec(name, iname, None, path)
                r["record_kind"] = "return_bind"
                r["content"] = ibase or None
                if re.search(r"\basync\b", sig):
                    r["import_type"] = "async"  # async arrow factory
                recs.append(r)
            elif impl_expr.startswith("{"):
                add_return_bind(name, body, sig)
            add_param_binds(name, sig, body)
            for t in set(_THROW.findall(body)):
                recs.append(_relation_rec(name, t, "throws", path))
            depth += sum(r.count("{") - r.count("}") for r in masked[i : end + 1])
            i = end + 1
            continue

        if in_class is not None and depth == class_depth + 1:
            m = _METHOD.match(dmsk)
            if m and m.group(1) not in _CALL_KEYWORDS | {"constructor"}:
                name = m.group(1)
                if name.startswith("["):
                    # computed member: name by the raw bracket expression,
                    # as tree-sitter's computed_property_name text would be
                    # (analysis/javascript_parser.py extract_node_text)
                    braw = re.search(r"\[[^\]]*\]", raw)
                    name = braw.group(0) if braw else name
                qual = f"{in_class}.{name}"
                end = _end_of_block(masked, i)
                sig = msk.strip().split("{")[0].strip()
                add_entity(
                    qual, "method", line_no, end + 1, [f"Method {name}"],
                    sig=sig, parent=in_class,
                )
                body = add_impl(qual, "method", i, end)
                mbody = "\n".join(masked[i : end + 1])
                add_calls(qual, mbody)
                add_type_binds(qual, mbody, cls=in_class)
                add_param_binds(qual, sig, mbody)
                add_return_bind(
                    qual, mbody, sig,
                    typeparam=class_typeparams.get(in_class),
                )  # static factory: Tool.create(); generic returns sentinel
                consume_decorators(qual)
                if _GETTER.match(dmsk) and not _STATIC_MEMBER.match(dmsk):
                    # TS getter = property: same marker row as @property
                    recs.append(
                        _relation_rec(qual, "property", "uses", path, "decorator")
                    )
                for t in set(_THROW.findall("\n".join(masked[i : end + 1]))):
                    recs.append(_relation_rec(qual, t, "throws", path))
                depth += sum(r.count("{") - r.count("}") for r in masked[i : end + 1])
                i = end + 1
                continue
            m = _METHOD.match(dmsk)
            if m and m.group(1) == "constructor":
                # constructors are not entities (reference parity) but
                # their `this.x = new C()` assignments ARE the canonical
                # class-scope type binds — peek without consuming so the
                # existing line-by-line handling is unchanged
                c_end = _end_of_block(masked, i)
                d = this_binds.setdefault(in_class, {})
                for var, ctor in _this_type_binds(
                    "\n".join(masked[i : c_end + 1])
                ).items():
                    if var in d and d[var] != ctor:
                        d[var] = None
                    elif var not in d:
                        d[var] = ctor
            m = _FIELD.match(dmsk)
            if m and m.group(1) not in _CALL_KEYWORDS:
                qual = f"{in_class}.{m.group(1)}"
                add_entity(
                    qual, "field", line_no, line_no,
                    [f"Class field {m.group(1)}"], parent=in_class,
                )
                consume_decorators(qual)
                # field declarations type the instance attr like Python's
                # class-body annotations: `db: Database;` (declared
                # intent, wins) or `db = new Database()` (initializer);
                # conflicts with constructor/method binds poison through
                # the same this_binds merge. Static fields are skipped —
                # they live on the class, not instances.
                if not _STATIC_MEMBER.match(dmsk):
                    fa = _FIELD_ANN.search(dmsk)
                    ctor = None
                    if fa and fa.group(1).split(".")[0] not in _TS_BUILTIN_TYPES:
                        ctor = fa.group(1)
                    elif fa is None:
                        fn2 = _FIELD_NEW.search(dmsk)
                        if fn2:
                            ctor = fn2.group(1)
                    if ctor is not None:
                        d = this_binds.setdefault(in_class, {})
                        key = f"this.{m.group(1)}"
                        if key in d and d[key] != ctor:
                            d[key] = None
                        elif key not in d:
                            d[key] = ctor
                depth += msk.count("{") - msk.count("}")
                i += 1
                continue

        # import extraction reads the RAW line: the masked view blanks the
        # quoted module specifier
        m = _IMPORT.match(raw)
        if m:
            module = m.group(6)
            recs.append(
                _entity_rec(module, "import", path, line_no, None, [f"Imports {module}"])
            )
            recs.append(_relation_rec(path, module, "imports", path, "module"))
            target = _spec_to_module(path, module)
            for g, itype in ((m.group(1), "default"), (m.group(3), "namespace"),
                             (m.group(5), "namespace")):
                if g:
                    recs.append(_relation_rec(path, g, "imports", path, itype))
                    if target and itype == "namespace":
                        # `import * as ns from './m'` ≙ Python's module
                        # alias: ns.f() resolves against the module's defs
                        b = _relation_rec(g, target, "import_binding", path, "module")
                        b["record_kind"] = "import_binding"
                        recs.append(b)
                    elif target and itype == "default":
                        # `import W from './m'` binds W to the module's
                        # DEFAULT export, whose name this file can't see —
                        # the '__default__' member is rewritten by the
                        # resolver against the exporting module's
                        # default_export marker (and stays unresolved if
                        # that module has none / an anonymous one)
                        b = _relation_rec(g, target, "import_binding", path, "from")
                        b["record_kind"] = "import_binding"
                        b["content"] = "__default__"
                        recs.append(b)
            for names in (m.group(2), m.group(4)):
                if names:
                    for nm in names.split(","):
                        nm = nm.strip().replace("type ", "").strip()
                        orig, _, local = nm.partition(" as ")
                        orig, local = orig.strip(), (local.strip() or orig.strip())
                        if orig:
                            recs.append(
                                _relation_rec(path, orig, "imports", path, "named")
                            )
                            if target:
                                b = _relation_rec(
                                    local, target, "import_binding", path, "from"
                                )
                                b["record_kind"] = "import_binding"
                                b["content"] = orig
                                recs.append(b)
            matched = True

        if not matched:
            em = _EXPORT_FROM.match(raw)
            if em:
                # re-export: `export {x} from 'mod'` / `export * from 'mod'`
                # depends on mod exactly like an import does
                mod = em.group(1)
                recs.append(
                    _entity_rec(mod, "import", path, line_no, None, [f"Imports {mod}"])
                )
                recs.append(_relation_rec(path, mod, "imports", path, "reexport"))
                # named re-exports bind like from-imports so the
                # resolver's chase can hop through barrel files
                # (`lib/index.js: export { Tool } from './core'` — the
                # JS twin of `__init__.py: from .core import Tool`);
                # star re-exports bind nothing statically, as in Python
                target = _spec_to_module(path, mod)
                brace = re.search(r"\{([^}]*)\}", raw)
                if target and brace:
                    for nm in brace.group(1).split(","):
                        nm = nm.strip().replace("type ", "").strip()
                        orig, _, local = nm.partition(" as ")
                        orig, local = orig.strip(), (local.strip() or orig.strip())
                        if orig:
                            b = _relation_rec(
                                local, target, "import_binding", path, "from"
                            )
                            b["record_kind"] = "import_binding"
                            b["content"] = orig
                            recs.append(b)
                elif target:
                    head = raw.split("from")[0]
                    ns = re.search(r"\*\s+as\s+([\w$]+)", head)
                    if ns:
                        # `export * as core from './core'`: binds a
                        # module-valued name in the barrel
                        b = _relation_rec(
                            ns.group(1), target, "import_binding", path, "module"
                        )
                        b["record_kind"] = "import_binding"
                        recs.append(b)
                    elif "*" in head:
                        # `export * from './core'`: the barrel offers
                        # every export of the target to IMPORTERS of the
                        # barrel, but binds nothing in the barrel's own
                        # scope (a bare call inside the barrel does not
                        # see the target's names) — so this is a
                        # 'star_export' the resolver expands only on the
                        # chase/star_fix path, never in the bare-call
                        # star fallback (ADVICE r6).
                        b = _relation_rec(
                            "*" + target, target, "import_binding", path, "star_export"
                        )
                        b["record_kind"] = "import_binding"
                        recs.append(b)
                matched = True

        if not matched:
            bm = _BARE_IMPORT.match(raw)
            rm = _REQUIRE.search(raw)
            dm2 = _DYNAMIC_IMPORT.search(raw)
            mod = None
            if bm:
                mod = bm.group(1)
            elif rm:
                mod = rm.group(2)
            elif dm2:
                mod = dm2.group(1)
            if mod and not mod.endswith(".json"):
                recs.append(
                    _entity_rec(mod, "import", path, line_no, None, [f"Imports {mod}"])
                )
                recs.append(_relation_rec(path, mod, "imports", path, "module"))
                if rm and not bm:
                    # require() binds like imports: destructuring ≙ named
                    # imports, a bare identifier ≙ a module alias
                    target = _spec_to_module(path, mod)
                    lhs = rm.group(1)
                    if target:
                        if lhs.startswith("{"):
                            for nm in lhs.strip("{}").split(","):
                                nm = nm.strip()
                                orig, _, local = nm.partition(":")
                                orig = orig.strip()
                                local = local.strip() or orig
                                if orig:
                                    b = _relation_rec(
                                        local, target, "import_binding", path, "from"
                                    )
                                    b["record_kind"] = "import_binding"
                                    b["content"] = orig
                                    recs.append(b)
                        else:
                            b = _relation_rec(
                                lhs, target, "import_binding", path, "module"
                            )
                            b["record_kind"] = "import_binding"
                            recs.append(b)
                matched = True

        if not matched and (in_class is None or depth <= class_depth):
            m = _VAR_DECL.match(msk)
            if m and not re.search(r"=>|require\s*\(", msk):
                if depth == 0:  # module-level only (reference scope filter)
                    pat = m.group(1)
                    # defaults inside destructuring contain '=': re-capture
                    # the full bracketed pattern by bracket matching
                    decl = re.match(r"^\s*(?:export\s+)?(?:declare\s+)?"
                                    r"(?:const|let|var)\s+(.*)$", msk)
                    rest = decl.group(1) if decl else pat
                    if rest and rest[0] in "{[":
                        d = 0
                        for k, ch in enumerate(rest):
                            if ch in "{[":
                                d += 1
                            elif ch in "}]":
                                d -= 1
                                if d == 0:
                                    pat = rest[: k + 1]
                                    break
                    for nm in _destructured_names(pat):
                        if nm and not nm[0].isdigit():
                            add_entity(
                                nm, "variable", line_no, line_no, [f"Variable: {nm}"]
                            )
                    matched = True
            if not matched and depth == 0:
                am = _ASSIGN.match(msk)
                if am and am.group(1) not in _CALL_KEYWORDS:
                    add_entity(
                        am.group(1), "variable", line_no, line_no,
                        [f"Variable: {am.group(1)}", "Assignment expression"],
                    )

        # leave class scope when its closing brace passes
        depth += msk.count("{") - msk.count("}")
        while class_stack and depth <= class_stack[-1][1]:
            class_stack.pop()
        i += 1

    # class-scope (this.attr) binds merged across constructor + methods
    for cls, binds in sorted(this_binds.items()):
        for var, ctor in sorted(binds.items()):
            if ctor is not None:
                awaited = ctor.startswith("await ")
                if awaited:
                    ctor = ctor[len("await ") :]
                base, _, name = ctor.rpartition(".")
                recs.append(
                    _type_bind_rec(cls, var, name, base or None, path, awaited)
                )
            else:
                # poison marker, same contract as the Python parser: a
                # conflicted attr bind must BLOCK ancestor-level
                # resolution of the same attr, not silently vanish
                recs.append(_type_bind_rec(cls, var, "__poisoned__", None, path))
    # module-scope binds (const client = new Client() at top level)
    add_type_binds(path, "\n".join(toplevel_masked))
    return recs
