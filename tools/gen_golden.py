"""Regenerate the committed golden sidecars under golden/ (fixture-side
expected outputs for the engine queries — see unipdf_spark.fixtures.golden).

    python tools/gen_golden.py [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from unipdf_spark.fixtures import golden  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or None
    for path in golden.write_sidecars("golden", names):
        print("wrote", path)


if __name__ == "__main__":
    main()
