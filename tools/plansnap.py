"""Write ``explain("formatted")`` for named catalog queries to
``plans/r12/<query>_<tag>.txt`` without timing anything.

Usage: python tools/plansnap.py [--repo DIR] [--plans DIR] [sf_dir]
           --tag TAG q1 q2 ...

``--repo`` lets the snapshot run against ANOTHER checkout's engine
package (e.g. a worktree at the pre-optimization commit) while writing
into this repo's plans dir.
"""

from __future__ import annotations

import io
import os
import sys


def main() -> int:
    args = list(sys.argv[1:])
    repo = "."
    if "--repo" in args:
        i = args.index("--repo")
        repo = args[i + 1]
        del args[i : i + 2]
    plans_dir = os.path.join(os.getcwd(), "plans", "r12")
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    tag = "after"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = args

    sys.path.insert(0, repo)
    from claude_code_memory_spark.queries import REGISTRY
    from claude_code_memory_spark.session import get_spark

    spark = get_spark(f"plansnap-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(plans_dir, exist_ok=True)
    for n in names:
        df = REGISTRY[n].fn(spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(plans_dir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
