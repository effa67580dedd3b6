"""Template expansion — the web-text analog of the reference's LaTeX
macro engine, its largest string-processing family:

  - `\\def\\name#1…{body}` parse + argument capture
    (/root/reference/ec2/parse_papers/latex_parse.py:19-45, T3)
  - `\\newcommand{\\x}[n]{…}` with arg counts
    (/root/reference/ec2/parse_papers/latex_parse.py:81-109, T4)
  - fixpoint expansion with recursion pruning and LONGEST-NAME-FIRST
    substitution order (so `\\ab` never partially captures `\\abc`)
    (/root/reference/ec2/parse_arxiv_papers/tex_method/
     expand_latex_macros.py:170-211, 192-196, T13)

Re-expressed over wiki-style templates, the form web text actually
carries:

    definition:  {{def:NAME(2)|BODY with #1 and #2}}
    call:        {{NAME|arg1|arg2}}   /   {{NAME}} for 0-arg

`expand_templates` strips the definitions, then substitutes calls until
the text stops changing (bounded iterations — a self-recursive template
is pruned, not looped on, exactly the reference's recursion guard).

Pure str→str — vectorizes over a pd.Series in one Arrow batch; no
per-row Python UDF, no subprocess.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T

MAX_ITERS = 10

# body may contain complete one-level {{...}} calls (the reference's
# NEWDEF uses a recursive-brace regex; stdlib `re` has no recursion, so
# one nesting level is the documented depth — deeper nests resolve
# through the fixpoint loop instead)
_DEF_RE = re.compile(
    r"\{\{def:([A-Za-z][A-Za-z0-9_]*)\((\d+)\)\|((?:[^{}]|\{\{[^{}]*\}\})*?)\}\}"
)


def parse_defs(text: str) -> tuple[str, dict[str, tuple[int, str]]]:
    """Extract template definitions; returns (text-without-defs,
    {name: (n_args, body)}). Later definitions win (the reference's
    dict-union right-wins, extract_from_tex.py:62-64)."""
    defs: dict[str, tuple[int, str]] = {}

    def grab(m: re.Match) -> str:
        defs[m.group(1)] = (int(m.group(2)), m.group(3))
        return " "

    return _DEF_RE.sub(grab, text), defs


def _call_re(name: str) -> re.Pattern:
    # {{NAME}} or {{NAME|a|b}} — args may not contain braces or pipes
    return re.compile(r"\{\{" + re.escape(name) + r"((?:\|[^{}|]*)*)\}\}")


# a body that is EXACTLY one call with in-order placeholder passthrough:
# {{TARGET}} or {{TARGET|#1|#2|...}} — surrounding whitespace captured
# so lifting preserves it (the fixpoint expansion would)
_WRAPPER_BODY_RE = re.compile(
    r"^(\s*)\{\{([A-Za-z][A-Za-z0-9_]*)((?:\|#\d+)*)\}\}(\s*)$"
)


def lift_wrappers(defs: dict[str, tuple[int, str]]) -> dict[str, tuple[int, str]]:
    """Wrapper lifting (T7): a definition whose body is exactly a call
    to another definition, passing its own placeholders through in
    order, inherits the target's body — the analog of the reference
    synthesizing `\\newtheorem{e}` when `\\newenvironment{e}`'s begin
    code wraps a theorem env
    (/root/reference/ec2/parse_papers/latex_parse.py:128-157).

    Chains of wrappers resolve transitively with a depth cap (cycle
    guard), so a wrapper-of-a-wrapper expands in ONE fixpoint pass even
    past MAX_ITERS of nesting. Non-wrapper definitions pass through
    untouched."""
    out = dict(defs)
    for name in defs:
        seen = {name}
        n_args, body = out[name]
        for _ in range(len(defs)):
            m = _WRAPPER_BODY_RE.match(body)
            if not m or m.group(2) not in out or m.group(2) in seen:
                break
            pre, target, raw, post = m.groups()
            got = raw.split("|")[1:] if raw else []
            t_args, t_body = out[target]
            if got != [f"#{i}" for i in range(1, n_args + 1)] or len(got) != t_args:
                break  # partial / reordered passthrough: not a pure wrapper
            seen.add(target)
            # whitespace around the call survives, exactly as the
            # fixpoint substitution would have produced
            body = pre + t_body + post
        out[name] = (n_args, body)
    return out


def expand_templates(
    text: str, extra_defs: dict[str, tuple[int, str]] | None = None,
    max_iters: int = MAX_ITERS,
) -> str:
    """Expand template calls against in-text + supplied definitions.

    Substitution is longest-name-first within each pass (latex_parse.py
    :30,94) and repeats to a fixpoint with an iteration cap
    (expand_latex_macros.py:170-211): nested calls resolve, recursive
    ones stop growing after the cap instead of diverging."""
    text, defs = parse_defs(text)
    if extra_defs:
        defs = {**defs, **extra_defs}  # right-wins union (SO2 analog)
    if not defs:
        return text
    defs = lift_wrappers(defs)  # T7: wrappers inherit their target's body
    order = sorted(defs, key=len, reverse=True)  # longest-first
    pats = {name: _call_re(name) for name in order}

    for _ in range(max_iters):
        changed = False
        for name in order:
            n_args, body = defs[name]

            def sub(m: re.Match, n_args=n_args, body=body) -> str:
                raw = m.group(1)
                args = raw.split("|")[1:] if raw else []
                if len(args) != n_args:
                    return m.group(0)  # arity mismatch: leave the call as-is
                out = body
                for i, a in enumerate(args, 1):
                    out = out.replace(f"#{i}", a)
                return out

            new = pats[name].sub(sub, text)
            if new != text:
                changed = True
                text = new
        if not changed:
            break
    return text


@F.pandas_udf(T.StringType())
def expand_templates_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda s: expand_templates(s) if s is not None else None)
