#!/usr/bin/env python3
"""Generate markdown API docs from module/class/function docstrings.

Equivalent of the reference's Sphinx monorepo docs generator
(``docs/conf.py`` + ``mirror_referenced_dirs.py``) at markdown scale: walks
``accvlab_tpu``'s subpackages and writes one ``docs/api/<package>.md`` per
capability area with the public symbols' signatures and docstrings.
"""

import importlib
import inspect
import re
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PACKAGES = [
    "accvlab_tpu.ragged",
    "accvlab_tpu.heatmap",
    "accvlab_tpu.polyline",
    "accvlab_tpu.hostcopy",
    "accvlab_tpu.pipeline",
    "accvlab_tpu.pipeline.inputs",
    "accvlab_tpu.pipeline.processing_steps",
    "accvlab_tpu.pipeline.operators",
    "accvlab_tpu.color",
    "accvlab_tpu.video",
    "accvlab_tpu.tools",
    "accvlab_tpu.parallel",
    "accvlab_tpu.models",
    "accvlab_tpu.build_config",
]



def _stable_sig(sig) -> str:
    """Signature repr with run-specific memory addresses normalized
    (default-value reprs like '<_Sentinel object at 0x7f...>' differ per
    process and would churn the generated docs on every regeneration)."""
    return re.sub(r" at 0x[0-9a-fA-F]+", "", str(sig))

def doc_symbol(name, obj, lines):
    try:
        sig = _stable_sig(inspect.signature(obj))
    except (ValueError, TypeError):
        sig = ""
    kind = "class" if inspect.isclass(obj) else "def"
    lines.append(f"### `{kind} {name}{sig}`\n")
    doc = inspect.getdoc(obj)
    if doc:
        lines.append(doc + "\n")
    if inspect.isclass(obj):
        for mname, member in sorted(vars(obj).items()):
            if mname.startswith("_") or not callable(member):
                continue
            try:
                msig = _stable_sig(inspect.signature(member))
            except (ValueError, TypeError):
                msig = ""
            mdoc = inspect.getdoc(member)
            first = mdoc.splitlines()[0] if mdoc else ""
            lines.append(f"- `{mname}{msig}` — {first}")
        lines.append("")


def main():
    out_dir = os.path.join(ROOT, "docs", "api")
    os.makedirs(out_dir, exist_ok=True)
    for pkg_name in PACKAGES:
        mod = importlib.import_module(pkg_name)
        lines = [f"# {pkg_name}\n"]
        if mod.__doc__:
            lines.append(inspect.cleandoc(mod.__doc__) + "\n")
        public = getattr(mod, "__all__", None) or [
            n for n in dir(mod) if not n.startswith("_")
        ]
        for name in public:
            obj = getattr(mod, name, None)
            if obj is None or inspect.ismodule(obj):
                continue
            if callable(obj):
                doc_symbol(name, obj, lines)
        fname = pkg_name.replace("accvlab_tpu.", "").replace(".", "_") + ".md"
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("\n".join(lines))
        print(f"wrote docs/api/{fname}")


if __name__ == "__main__":
    main()
