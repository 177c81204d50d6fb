"""Command-line interface.

TPU-native equivalent of the reference's CLI (/root/reference/luaradio:29-123):
run a flow-graph script, or dispatch a built-in application with
-a/--application, -i/--input, -o/--output.
"""

from __future__ import annotations

import argparse
import runpy
import sys


class Args(dict):
    """Application argument bag: positional by integer index, options by
    name (mirrors the reference's parsed-args table)."""

    def __init__(self, positional, options):
        super().__init__(options)
        self._positional = list(positional)

    def __getitem__(self, key):
        if isinstance(key, int):
            return self._positional[key]
        return super().__getitem__(key)

    @property
    def positional(self):
        return list(self._positional)


def _platform_info() -> str:
    import jax

    import luaradio_tpu
    lines = [
        f"luaradio_tpu {luaradio_tpu.__version__}",
        f"jax {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
    ]
    return "\n".join(lines)


def _list_applications() -> str:
    from luaradio_tpu.applications import APPLICATIONS
    lines = []
    for name in sorted(APPLICATIONS):
        app = APPLICATIONS[name]
        lines.append(f"  {name:<14} {app.description}")
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="luaradio-tpu",
        description="TPU-native software-defined-radio framework",
        epilog="applications:\n" + _list_applications(),
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--version", action="store_true",
                        help="print version and exit")
    parser.add_argument("--platform", action="store_true",
                        help="dump platform info and exit")
    parser.add_argument("-a", "--application", metavar="NAME",
                        help="run a built-in application")
    parser.add_argument("-i", "--input", metavar="SPEC",
                        help="application input, e.g. "
                             "iqfile:capture.iq,format=f32le,rate=1e6")
    parser.add_argument("-o", "--output", metavar="SPEC",
                        help="application output, e.g. wavfile:out.wav")
    parser.add_argument("--ingest", metavar="MODE",
                        choices=["auto", "stream", "wire", "resident"],
                        help="force the source ingest mode: stream (host "
                             "conversion), wire (raw integer samples "
                             "converted on-device), resident (repeating "
                             "file kept in device memory); default auto")
    parser.add_argument("--ingest-stripes", metavar="N", type=int,
                        help="parallel host->device transfer stripes for "
                             "large payloads (default 2; the tunneled "
                             "transport's throttle is per-connection)")
    parser.add_argument("script_or_args", nargs="*",
                        help="flow-graph script to run, or application "
                             "arguments / --options")
    ns, extra = parser.parse_known_args(argv)
    ns.script_or_args = ns.script_or_args + extra

    # ingest options flow to every Runner (scripts and applications alike)
    # through the environment — the same override surface as the
    # reference's LUARADIO_* env flags (platform.lua:328-330)
    import os
    if ns.ingest:
        os.environ["LUARADIO_TPU_INGEST"] = ns.ingest
    if ns.ingest_stripes is not None:
        if ns.ingest_stripes < 1:
            parser.error("--ingest-stripes must be >= 1")
        os.environ["LUARADIO_TPU_STRIPES"] = str(ns.ingest_stripes)

    if ns.version:
        import luaradio_tpu
        print(f"luaradio_tpu {luaradio_tpu.__version__}")
        return 0
    if ns.platform:
        print(_platform_info())
        return 0

    if ns.application:
        if not ns.input or not ns.output:
            parser.error("-a requires both -i <input> and -o <output>")
        positional, options = [], {}
        rest = list(ns.script_or_args)
        while rest:
            tok = rest.pop(0)
            if tok.startswith("--"):
                key = tok[2:]
                if "=" in key:
                    key, _, val = key.partition("=")
                    options[key] = val
                elif rest and not rest[0].startswith("--"):
                    options[key] = rest.pop(0)
                else:
                    options[key] = True
            else:
                positional.append(tok)
        from luaradio_tpu import applications
        applications.run(ns.application, ns.input, ns.output,
                         Args(positional, options))
        return 0

    if ns.script_or_args:
        script = ns.script_or_args[0]
        sys.argv = ns.script_or_args
        runpy.run_path(script, run_name="__main__")
        return 0

    parser.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
