"""IO: reference-compatible pickle files + npz checkpoint/resume.

The reference persists input dicts with pickle (``save_to_file``, ref
``library.py:2442-2455``) and has no checkpointing (SURVEY §5). Here:

* :func:`save_to_file` / :func:`load_input` — byte-compatible with the
  reference's ``.p`` files (the tutorial pickles load unchanged);
* :func:`save_checkpoint` / :func:`load_checkpoint` — flat-npz persistence
  for retrieval/optimizer state (pytrees of arrays), the checkpoint/resume
  facility for long batched inversions.
"""

import pickle

import numpy as np

__all__ = ["save_to_file", "load_input", "save_checkpoint",
           "load_checkpoint"]


def save_to_file(output, file_path):
    """Pickle a dict to ``file_path`` (API-parity, ref :2442-2455)."""
    with open(file_path, "wb") as f:
        pickle.dump(output, f)


def load_input(file_path):
    """Load a reference-format ``.p`` input dict (e.g. the tutorial files)."""
    with open(file_path, "rb") as f:
        return pickle.load(f)


# Key separator for flattened nested dicts. A unit separator (0x1f) cannot
# appear in sane keys — '.'-joining silently mis-nests keys that themselves
# contain dots (e.g. a frequency label '2.5').
_SEP = "\x1f"

# Sentinel key marking the U+001F-separated format. Presence of the marker —
# not key contents — decides how load_checkpoint splits: a flat new-format
# dict whose only key is '2.5' must NOT be mis-detected as the legacy
# '.'-separated format.
_FMT_MARKER = "__fmt_v2__"


def _flatten(prefix, obj, out):
    if isinstance(obj, dict):
        for k, v in obj.items():
            if _SEP in str(k):
                raise ValueError(f"checkpoint key {k!r} contains the "
                                 "reserved separator U+001F")
            _flatten(f"{prefix}{_SEP}{k}" if prefix else str(k), v, out)
    else:
        out[prefix] = np.asarray(obj)


def save_checkpoint(state, file_path):
    """Persist a (nested-dict) pytree of arrays to a flat .npz file.

    The write is atomic (temp file + ``os.replace``): a kill landing
    mid-save — the exact scenario checkpoints exist for — leaves the
    previous checkpoint intact rather than a truncated zip.
    """
    import os
    flat = {}
    _flatten("", state, flat)
    flat[_FMT_MARKER] = np.asarray(2)
    tmp = f"{file_path}.tmp.{os.getpid()}"
    try:
        np.savez_compressed(tmp, **flat)
        # numpy appends .npz when the name lacks it
        if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
            tmp = tmp + ".npz"
        os.replace(tmp, file_path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(file_path):
    """Inverse of :func:`save_checkpoint` — rebuilds the nested dict.

    Three generations of files: marked (``__fmt_v2__``) → split only on
    U+001F, so keys containing dots (e.g. '2.5') round-trip unchanged;
    unmarked with U+001F in some key → the marker-less U+001F format of
    the previous release; unmarked without → the original '.'-separated
    flatten, split on '.' as a best effort.
    """
    data = np.load(file_path, allow_pickle=False)
    if _FMT_MARKER in data.files:
        sep = _SEP
    elif any(_SEP in k for k in data.files):
        sep = _SEP
    else:
        sep = "."
    out = {}
    for key in data.files:
        if key == _FMT_MARKER:
            continue
        parts = key.split(sep)
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return out
