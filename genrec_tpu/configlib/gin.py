"""A small gin-compatible configuration system.

The reference framework (phonism/genrec) drives every trainer through
gin-config files (``config/*.gin``; see ``/root/reference/genrec/modules/utils.py:85-117``
for the CLI contract).  The upstream ``gin-config`` package is not available in
this environment, so this module implements the subset of gin that GenRec's
configs exercise, with the same file syntax:

* ``scope.param = value`` bindings (suffix-matched scopes)
* ``include "path.gin"``
* ``import some.module`` (with ``genrec.`` → ``genrec_tpu.`` rewriting so the
  reference's configs parse unmodified)
* ``@configurable`` references and ``@configurable()`` evaluated references
* ``%MACRO`` macros (bare ``NAME = value`` assignments) and
  ``%module.Enum.MEMBER`` enum constants registered via
  :func:`constants_from_enum`
* Python literals: strings, numbers, booleans, ``None``, lists, tuples, dicts

Values may be arbitrary Python literal expressions; ``@ref``/``%macro`` tokens
are resolved lazily at configurable-call time so that definition order inside a
file does not matter (matching gin semantics).
"""

from __future__ import annotations

import ast
import enum
import functools
import importlib
import inspect
import os
import re
import threading
from typing import Any, Callable

__all__ = [
    "configurable",
    "external_configurable",
    "constants_from_enum",
    "parse_config",
    "parse_config_file",
    "parse_config_files_and_bindings",
    "bind_parameter",
    "query_parameter",
    "clear_config",
    "config_str",
    "operative_config",
    "REQUIRED",
]


class GinError(Exception):
    pass


class _Required:
    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "REQUIRED"


REQUIRED = _Required()

_LOCK = threading.RLock()
# name -> callable. Names are registered under their short name and their
# fully qualified "module.name" path.
_REGISTRY: dict[str, Callable] = {}
# (scope, param) -> raw (unresolved) value
_BINDINGS: dict[tuple[str, str], Any] = {}
# macro name -> raw value
_MACROS: dict[str, Any] = {}
# constant qualified-name -> value (e.g. "genrec_tpu.models.rqvae.QuantizeForwardMode.STE")
_CONSTANTS: dict[str, Any] = {}
# record of (scope, param) bindings actually consumed, for operative_config()
_OPERATIVE: dict[tuple[str, str], Any] = {}


# --------------------------------------------------------------------------
# Registration
# --------------------------------------------------------------------------

def _register(name: str, fn: Callable) -> None:
    with _LOCK:
        _REGISTRY[name] = fn


def configurable(fn: Callable | None = None, *, name: str | None = None,
                 module: str | None = None,
                 denylist: tuple[str, ...] = ()) -> Callable:
    """Decorator: make ``fn``'s keyword arguments bindable from config files.

    Mirrors ``gin.configurable``: at call time any parameter that was not
    passed explicitly and has a binding under this configurable's scope gets
    the bound value injected.
    """

    def wrap(f: Callable) -> Callable:
        short = name or f.__name__
        mod = module or getattr(f, "__module__", None)
        is_class = inspect.isclass(f)
        target = f.__init__ if is_class else f
        try:
            sig = inspect.signature(target)
        except (TypeError, ValueError):  # builtins
            sig = None

        def inject(args, kwargs):
            bound = get_bindings(short)
            if bound:
                if sig is not None:
                    params = sig.parameters
                    has_var_kw = any(
                        p.kind is inspect.Parameter.VAR_KEYWORD
                        for p in params.values())
                    positional_names = [
                        p.name for p in params.values()
                        if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                                      inspect.Parameter.POSITIONAL_OR_KEYWORD)]
                    if is_class and positional_names and positional_names[0] == "self":
                        positional_names = positional_names[1:]
                    consumed = set(positional_names[: len(args)])
                    for k, v in bound.items():
                        if k in denylist or k in kwargs or k in consumed:
                            continue
                        if has_var_kw or k in params:
                            kwargs[k] = v
                            _OPERATIVE[(short, k)] = v
                else:
                    for k, v in bound.items():
                        if k not in kwargs and k not in denylist:
                            kwargs[k] = v
                            _OPERATIVE[(short, k)] = v
            for k, v in list(kwargs.items()):
                if isinstance(v, _Required):
                    raise GinError(
                        f"Required parameter {short}.{k} was not bound")
            if sig is not None:
                params = sig.parameters
                positional_names = [
                    p.name for p in params.values()
                    if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                                  inspect.Parameter.POSITIONAL_OR_KEYWORD)]
                if is_class and positional_names and positional_names[0] == "self":
                    positional_names = positional_names[1:]
                covered = set(positional_names[: len(args)]) | set(kwargs)
                for p in params.values():
                    if (isinstance(p.default, _Required)
                            and p.name not in covered):
                        raise GinError(
                            f"Required parameter {short}.{p.name} was not bound")
            return kwargs

        if is_class:
            # Patch __init__ in place: preserves classmethods, isinstance,
            # and dataclass/flax-module semantics (a function wrapper would
            # shadow class attributes — e.g. `Cls.load_pretrained` breaks).
            orig_init = f.__init__

            @functools.wraps(orig_init)
            def init_with_gin(self, *args, **kwargs):
                kwargs = inject(args, kwargs)
                orig_init(self, *args, **kwargs)

            f.__init__ = init_with_gin
            registered = f
        else:
            @functools.wraps(f)
            def wrapper(*args, **kwargs):
                kwargs = inject(args, kwargs)
                return f(*args, **kwargs)
            registered = wrapper

        registered.__gin_name__ = short
        _register(short, registered)
        if mod:
            _register(f"{mod}.{short}", registered)
        return registered

    if fn is not None:
        return wrap(fn)
    return wrap


def external_configurable(fn: Callable, name: str | None = None,
                          module: str | None = None) -> Callable:
    """Register an externally-defined callable (e.g. an optax factory)."""
    return configurable(fn, name=name, module=module)


def constants_from_enum(cls: type | None = None, *, module: str | None = None):
    """Register every member of an Enum as a ``%`` constant (gin parity)."""

    def wrap(c: type) -> type:
        if not issubclass(c, enum.Enum):
            raise TypeError(f"{c} is not an Enum")
        mod = module or c.__module__
        with _LOCK:
            for member in c:
                _CONSTANTS[f"{mod}.{c.__name__}.{member.name}"] = member
        return c

    if cls is not None:
        return wrap(cls)
    return wrap


def constant(name: str, value: Any) -> None:
    with _LOCK:
        _CONSTANTS[name] = value


# --------------------------------------------------------------------------
# Value parsing
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""('(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")   # string literal
      | @([A-Za-z_][\w\.]*)(\(\))?               # @ref or @ref()
      | %([A-Za-z_][\w\.]*)                       # %macro / %constant
    """,
    re.VERBOSE,
)


class _Ref:
    """Lazy reference to a configurable (``@name``) or its call (``@name()``)."""

    __slots__ = ("name", "call")

    def __init__(self, name: str, call: bool):
        self.name = name
        self.call = call

    def __repr__(self):
        return f"@{self.name}" + ("()" if self.call else "")


class _Macro:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return f"%{self.name}"


def _parse_value(text: str) -> Any:
    """Parse a gin value expression into a (possibly lazy) Python value."""
    placeholders: dict[str, Any] = {}

    def sub(m: re.Match) -> str:
        if m.group(1) is not None:
            return m.group(0)  # string literal untouched
        key = f"__gin_ph_{len(placeholders)}__"
        if m.group(2) is not None:
            placeholders[key] = _Ref(m.group(2), call=bool(m.group(3)))
        else:
            placeholders[key] = _Macro(m.group(4))
        return key

    replaced = _TOKEN_RE.sub(sub, text.strip())
    try:
        node = ast.parse(replaced, mode="eval")
    except SyntaxError as e:
        raise GinError(f"Cannot parse gin value: {text!r}") from e

    def build(n: ast.AST) -> Any:
        if isinstance(n, ast.Expression):
            return build(n.body)
        if isinstance(n, ast.Constant):
            return n.value
        if isinstance(n, ast.Name):
            if n.id in placeholders:
                return placeholders[n.id]
            raise GinError(f"Unknown name {n.id!r} in gin value {text!r}")
        if isinstance(n, ast.List):
            return [build(e) for e in n.elts]
        if isinstance(n, ast.Tuple):
            return tuple(build(e) for e in n.elts)
        if isinstance(n, ast.Dict):
            return {build(k): build(v) for k, v in zip(n.keys, n.values)}
        if isinstance(n, ast.Set):
            return {build(e) for e in n.elts}
        if isinstance(n, ast.UnaryOp) and isinstance(n.op, ast.USub):
            return -build(n.operand)
        if isinstance(n, ast.BinOp):  # e.g. 2**10 or 1e-4 variants
            left, right = build(n.left), build(n.right)
            if isinstance(n.op, ast.Mult):
                return left * right
            if isinstance(n.op, ast.Add):
                return left + right
            if isinstance(n.op, ast.Sub):
                return left - right
            if isinstance(n.op, ast.Div):
                return left / right
            if isinstance(n.op, ast.Pow):
                return left ** right
            if isinstance(n.op, ast.FloorDiv):
                return left // right
        raise GinError(f"Unsupported syntax in gin value: {text!r}")

    return build(node)


def _resolve(value: Any) -> Any:
    """Resolve lazy refs/macros inside a parsed value."""
    if isinstance(value, _Ref):
        fn = _lookup_configurable(value.name)
        return fn() if value.call else fn
    if isinstance(value, _Macro):
        return _lookup_macro(value.name)
    if isinstance(value, list):
        return [_resolve(v) for v in value]
    if isinstance(value, tuple):
        return tuple(_resolve(v) for v in value)
    if isinstance(value, dict):
        return {k: _resolve(v) for k, v in value.items()}
    return value


def _suffix_lookup(table: dict[str, Any], name: str, kind: str) -> Any:
    """Dotted-name lookup with gin-style suffix matching.

    Tries the full name, then progressively shorter dotted suffixes of it, so
    the reference's ``genrec.models.rqvae.QuantizeForwardMode.STE`` resolves
    against our ``genrec_tpu.models.rqvae.QuantizeForwardMode.STE``.
    """
    if name in table:
        return table[name]
    parts = name.split(".")
    for start in range(1, len(parts)):
        cand = ".".join(parts[start:])
        hits = {id(v): v for k, v in table.items()
                if k == cand or k.endswith("." + cand)}
        if len(hits) == 1:
            return next(iter(hits.values()))
        if len(hits) > 1:
            raise GinError(f"Ambiguous {kind} {name!r}: multiple matches")
    raise GinError(f"Unknown {kind}: {name!r}")


def _lookup_configurable(name: str) -> Callable:
    with _LOCK:
        return _suffix_lookup(_REGISTRY, name, "configurable")


def _lookup_macro(name: str) -> Any:
    with _LOCK:
        if name in _MACROS:
            return _resolve(_MACROS[name])
        try:
            return _suffix_lookup(_CONSTANTS, name, "constant")
        except GinError:
            raise GinError(f"Unknown macro/constant: %{name}")


# --------------------------------------------------------------------------
# File parsing
# --------------------------------------------------------------------------

_IMPORT_REWRITES = {"genrec": "genrec_tpu"}


def _strip_comment(line: str) -> str:
    out, in_str, quote = [], False, ""
    i = 0
    while i < len(line):
        c = line[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < len(line):
                out.append(line[i + 1])
                i += 2
                continue
            if c == quote:
                in_str = False
        else:
            if c == "#":
                break
            out.append(c)
            if c in "'\"":
                in_str, quote = True, c
        i += 1
    return "".join(out)


def _logical_lines(text: str):
    """Yield logical lines, joining bracket continuations (multi-line lists)."""
    buf, depth = [], 0
    for raw in text.splitlines():
        line = _strip_comment(raw).rstrip()
        if not line.strip() and not buf:
            continue
        buf.append(line.strip() if buf else line)
        depth += line.count("[") + line.count("(") + line.count("{")
        depth -= line.count("]") + line.count(")") + line.count("}")
        if depth <= 0:
            joined = " ".join(buf).strip()
            buf, depth = [], 0
            if joined:
                yield joined
    if buf:
        joined = " ".join(buf).strip()
        if joined:
            yield joined


_BINDING_RE = re.compile(
    r"^([A-Za-z_][\w\.\/]*?)(?:\.([A-Za-z_]\w*))?\s*=\s*(.+)$")


def parse_config(text: str, *, base_dir: str | None = None) -> None:
    """Parse gin-format config text and record bindings/macros."""
    for line in _logical_lines(text):
        if line.startswith("include"):
            m = re.match(r"include\s+['\"](.+?)['\"]", line)
            if not m:
                raise GinError(f"Bad include line: {line!r}")
            path = m.group(1)
            cands = []
            if base_dir:
                cands.append(os.path.join(base_dir, os.path.basename(path)))
                # walk ancestors: includes like "config/base.gin" are
                # repo-root-relative in the reference's configs
                d = base_dir
                for _ in range(8):
                    cands.append(os.path.join(d, path))
                    parent = os.path.dirname(d)
                    if parent == d:
                        break
                    d = parent
            cands.append(path)
            here = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            cands.append(os.path.join(here, path))
            for cand in cands:
                if os.path.exists(cand):
                    parse_config_file(cand)
                    break
            else:
                raise GinError(f"Cannot find include: {path!r}")
            continue
        if line.startswith("import "):
            mod = line[len("import "):].strip()
            root = mod.split(".", 1)[0]
            if root in _IMPORT_REWRITES:
                mod = _IMPORT_REWRITES[root] + mod[len(root):]
            try:
                importlib.import_module(mod)
            except ImportError:
                pass  # tolerated: reference configs import modules we reorganised
            continue
        m = _BINDING_RE.match(line)
        if not m:
            raise GinError(f"Cannot parse gin line: {line!r}")
        scope, param, raw = m.group(1), m.group(2), m.group(3)
        value = _parse_value(raw)
        with _LOCK:
            if param is None:
                _MACROS[scope] = value
            else:
                # use the final scope component (gin short-name semantics)
                _BINDINGS[(scope.split(".")[-1], param)] = value


def parse_config_file(path: str) -> None:
    with open(path) as f:
        text = f.read()
    parse_config(text, base_dir=os.path.dirname(os.path.abspath(path)))


def parse_config_files_and_bindings(config_files=(), bindings=()) -> None:
    for p in config_files or ():
        parse_config_file(p)
    for b in bindings or ():
        parse_config(b)


# --------------------------------------------------------------------------
# Query / bind API
# --------------------------------------------------------------------------

def bind_parameter(name: str, value: Any) -> None:
    scope, param = name.rsplit(".", 1)
    with _LOCK:
        _BINDINGS[(scope.split(".")[-1], param)] = value


def query_parameter(name: str, default: Any = REQUIRED) -> Any:
    scope, param = name.rsplit(".", 1)
    with _LOCK:
        key = (scope.split(".")[-1], param)
        if key in _BINDINGS:
            return _resolve(_BINDINGS[key])
    if isinstance(default, _Required):
        raise GinError(f"No binding for {name}")
    return default


def get_bindings(scope: str) -> dict[str, Any]:
    """All resolved bindings for one configurable scope."""
    with _LOCK:
        raw = {p: v for (s, p), v in _BINDINGS.items() if s == scope}
    return {p: _resolve(v) for p, v in raw.items()}


def clear_config(keep_constants: bool = True) -> None:
    with _LOCK:
        _BINDINGS.clear()
        _MACROS.clear()
        _OPERATIVE.clear()
        if not keep_constants:
            _CONSTANTS.clear()


def config_str() -> str:
    """Render current bindings in gin file syntax (for logging/ckpt metadata)."""
    with _LOCK:
        lines = [f"{k} = {v!r}" for k, v in sorted(_MACROS.items())]
        lines += [f"{s}.{p} = {v!r}"
                  for (s, p), v in sorted(_BINDINGS.items())]
    return "\n".join(lines)


def operative_config() -> dict[str, Any]:
    with _LOCK:
        return {f"{s}.{p}": v for (s, p), v in sorted(_OPERATIVE.items())}
