"""Command-line entry point: ``python -m fibergen_tpu.cli project.xml``
(main, fibergen.cpp:27300-27354)."""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="fibergen-tpu",
        description="TPU-native FFT homogenization (fibergen-compatible)")
    p.add_argument("project", nargs="?", help="XML project file")
    p.add_argument("actions_path", nargs="?", default="actions",
                   help="path of the actions list in the XML tree")
    p.add_argument("--test", action="store_true",
                   help="run the built-in self-test suite")
    p.add_argument("--disable-python", action="store_true",
                   help="disable Python evaluation of XML attributes")
    args = p.parse_args(argv)

    if args.test:
        import pytest
        root = __file__.rsplit("/", 2)[0]
        return pytest.main(["-x", "-q", f"{root}/tests"])

    if not args.project:
        p.print_help()
        return 1

    from .api import FG
    fg = FG()
    if args.disable_python:
        fg.set_py_enabled(False)
    fg.load_xml(args.project)
    return fg.run(args.actions_path)


if __name__ == "__main__":
    sys.exit(main())
