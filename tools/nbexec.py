#!/usr/bin/env python
"""Minimal Jupyter-notebook executor (stdlib + matplotlib only).

The environment has no nbconvert/jupyter, but .ipynb files are plain
JSON: this runs every code cell in one shared namespace, captures stdout
and any matplotlib figures, and writes the outputs back into the file —
the moral equivalent of ``jupyter nbconvert --execute --inplace``.

Usage: python tools/nbexec.py NOTEBOOK [NOTEBOOK ...]
"""

import base64
import contextlib
import io
import json
import sys
import time
import traceback


def execute(path):
    with open(path) as f:
        nb = json.load(f)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ns = {"__name__": "__main__"}
    count = 0
    t0 = time.perf_counter()
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        count += 1
        cell["execution_count"] = count
        src = "".join(cell["source"])
        buf = io.StringIO()
        outputs = []
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(src, f"{path}[cell {count}]", "exec"), ns)
        except Exception:
            text = buf.getvalue()
            if text:
                outputs.append({"output_type": "stream", "name": "stdout",
                                "text": text.splitlines(keepends=True)})
            tb = traceback.format_exc()
            outputs.append({"output_type": "error", "ename": "Exception",
                            "evalue": tb.splitlines()[-1],
                            "traceback": tb.splitlines()})
            cell["outputs"] = outputs
            with open(path, "w") as f:
                json.dump(nb, f, indent=1)
            print(f"FAILED {path} cell {count}:\n{tb}", file=sys.stderr)
            return False
        text = buf.getvalue()
        if text:
            outputs.append({"output_type": "stream", "name": "stdout",
                            "text": text.splitlines(keepends=True)})
        for num in plt.get_fignums():
            fig = plt.figure(num)
            b = io.BytesIO()
            fig.savefig(b, format="png", dpi=110, bbox_inches="tight")
            outputs.append({
                "output_type": "display_data",
                "data": {"image/png":
                         base64.b64encode(b.getvalue()).decode()},
                "metadata": {}})
        plt.close("all")
        cell["outputs"] = outputs
    with open(path, "w") as f:
        json.dump(nb, f, indent=1)
    print(f"executed {path}: {count} code cells in "
          f"{time.perf_counter() - t0:.1f} s")
    return True


if __name__ == "__main__":
    ok = True
    for p in sys.argv[1:]:
        ok = execute(p) and ok
    sys.exit(0 if ok else 1)
