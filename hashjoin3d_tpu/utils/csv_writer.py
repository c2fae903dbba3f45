"""Measurement CSV emitter, byte-compatible with the reference's CSVWriter.

Equivalent of ``util/csv_writer.{hh,cc}``: ';'-separated fields, chainable
``write_field``/``newline``, file or stream targets, error on a missing parent
directory (``csv_writer.cc:19-22``).  Floats are rendered like C++ ostreams at
default precision (6 significant digits) so CSV rows diff cleanly against the
reference binaries' output.
"""

from __future__ import annotations

import sys
from pathlib import Path


def format_field(v) -> str:
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


class CSVWriter:
    """Chainable ;-separated writer.

    ``target`` may be a path (parent must exist), a file-like object, or None
    for stdout.
    """

    def __init__(self, target=None, sep: str = ";", flush_every_line: bool = True):
        self._sep = sep
        self._flush = flush_every_line
        self._line_started = False
        self._owns = False
        if target is None:
            self._out = sys.stdout
        elif isinstance(target, (str, Path)):
            p = Path(target)
            if not p.parent.exists():
                raise FileNotFoundError(
                    f"directory {p.parent} does not exist")
            self._out = open(p, "w")
            self._owns = True
        else:
            self._out = target

    def write_field(self, v) -> "CSVWriter":
        if self._line_started:
            self._out.write(self._sep)
        self._out.write(format_field(v))
        self._line_started = True
        return self

    def write_fields(self, *vs) -> "CSVWriter":
        for v in vs:
            self.write_field(v)
        return self

    def newline(self) -> "CSVWriter":
        self._out.write("\n")
        self._line_started = False
        if self._flush:
            self._out.flush()
        return self

    def close(self):
        if self._owns:
            self._out.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
