#!/usr/bin/env python3
"""Cross-validate the graft sas7bdat writer/reader against pandas'
independent SAS7BDAT implementation (driver-side tool, not a library
dependency).

Usage:
  sbt "Test/runMain graft.sources.sas.SasCrossCheckEmit /tmp/sas_xcheck"
  python3 tools/check_sas_pandas.py /tmp/sas_xcheck

For each <name>.sas7bdat in the directory: decode with pandas.read_sas
and diff against <name>.expected.csv (the writer's golden values), then
diff <name>.reader.csv (the engine reader's decode of the same binary)
against the same golden. Exit nonzero on any mismatch. A shared
misreading of the public spec between our writer and reader would show
up here as pandas disagreeing with the golden."""
import csv
import glob
import math
import os
import sys

import pandas as pd


def load_csv(path):
    with open(path, newline="") as f:
        r = list(csv.reader(f))
    return r[0], r[1:]


def cell_eq(expected, got):
    # '' encodes null/NaN on the CSV side
    if expected == "":
        return got is None or (isinstance(got, float) and math.isnan(got)) \
            or got == ""
    if isinstance(got, float):
        try:
            return abs(float(expected) - got) < 1e-9
        except ValueError:
            return False
    try:  # numeric CSV cell vs numeric-ish string from pandas
        return abs(float(expected) - float(got)) < 1e-9
    except (TypeError, ValueError):
        return str(expected) == str(got)


def diff(tag, header, rows, df):
    if list(df.columns) != header:
        print(f"FAIL {tag}: columns {list(df.columns)} != {header}")
        return 1
    if len(df) != len(rows):
        print(f"FAIL {tag}: {len(df)} rows != {len(rows)}")
        return 1
    bad = 0
    for i, exp in enumerate(rows):
        for j, col in enumerate(header):
            got = df.iloc[i, j]
            if isinstance(got, str):
                got = got.rstrip()
            if not cell_eq(exp[j], got):
                bad += 1
                if bad <= 5:
                    print(f"FAIL {tag}: row {i} col {col}: "
                          f"expected {exp[j]!r} got {got!r}")
    return bad


def main(d):
    fixtures = sorted(glob.glob(os.path.join(d, "*.sas7bdat")))
    if not fixtures:
        print(f"no fixtures in {d}")
        return 1
    failures = 0
    for fx in fixtures:
        name = os.path.splitext(os.path.basename(fx))[0]
        header, rows = load_csv(os.path.join(d, f"{name}.expected.csv"))
        df = pd.read_sas(fx, format="sas7bdat", encoding="latin-1")
        n = diff(f"{name} pandas-vs-golden", header, rows, df)
        failures += n
        print(f"{'OK  ' if n == 0 else 'BAD '}{name}: pandas "
              f"{len(df)} rows vs golden")
        rheader, rrows = load_csv(os.path.join(d, f"{name}.reader.csv"))
        mismatch = 0
        if rheader != header or len(rrows) != len(rows):
            mismatch = 1
        else:
            for exp, got in zip(rows, rrows):
                for e, g in zip(exp, got):
                    if not cell_eq(e, g) and e != g:
                        mismatch += 1
        failures += mismatch
        print(f"{'OK  ' if mismatch == 0 else 'BAD '}{name}: engine "
              f"reader vs golden")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(fixtures)} fixtures cross-checked")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sas_xcheck"))
