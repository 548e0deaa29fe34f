"""Portable npz weight IO — the compatibility contract with the reference.

The reference exports every TF variable by op name into a compressed npz
(xview/models/base_model.py:361-393) and imports with optional prefix
translation, optimizer-slot skipping and shape-tolerant "chill mode"
(base_model.py:395-451). Our variables already use those names, so this is a
straight dict round-trip plus the translation rules.
"""

import re
from os import path

import numpy as np


def export_weights(variables, output_dir, name, step=0):
    """Write variables to ``<output_dir>/<name>_weights_<step>.npz``."""
    output_path = path.join(output_dir, f"{name}_weights_{step}.npz")
    np.savez_compressed(output_path,
                        **{k: np.asarray(v) for k, v in variables.items()})
    print(f"INFO: Weights saved to {output_path}")
    return output_path


def _detect_import_prefix(keys):
    """First key's leading scope, before '/' and before '_'
    (reference base_model.py:412)."""
    scoped = sorted(k for k in keys if "/" in k)
    first = scoped[0] if scoped else sorted(keys)[0]
    return first.split("/")[0].split("_")[0]


def translate_name(name, target_prefix, import_prefix):
    """Translate ``target_prefix``-scoped names to the imported file's prefix
    (reference base_model.py:414-428)."""
    if not name.startswith(target_prefix):
        return name
    parts = name.split("/")
    sub = parts[0].split("_")
    if sub[0] == "forest":  # reference quirk: forest prefix is never touched
        return name
    sub[0] = import_prefix
    parts[0] = "_".join(sub)
    return "/".join(parts)


_OPTIMIZER_PAT = re.compile(r"grad|Adam|RMS")


def import_weights(variables, filepath, translate_prefix=False,
                   chill_mode=False, warnings=True):
    """Assign matching arrays from an npz file into a variables dict.

    Returns a NEW dict (functional update). Rules mirror the reference:
        * optimizer slot variables ('grad'/'Adam'/'RMS' in the name) skipped;
        * a name also matches if its first '/' is replaced by '_' (vgg16-style
          flat naming, base_model.py:435-437);
        * shape mismatches are ALWAYS skipped (with a warning); ``chill_mode``
          only changes the warning text. This is an intentional deviation:
          the reference's chill_mode=True *attempts* the mismatched
          ``variable.assign`` (base_model.py:438-445), which TF1 rejects at
          graph-build time for genuinely incompatible shapes — so the
          reference either crashed or (for compatible unknown dims)
          assigned. Here cross-modal first-layer surgery is done explicitly
          by experiments/finetuning.py (tile/mean of conv1_1) BEFORE import,
          so a mismatch surviving to this point is always a skip.
    """
    if warnings:
        print(filepath)
    with np.load(filepath) as archive:
        weights = {k: archive[k] for k in archive.files}
    import_prefix = _detect_import_prefix(weights.keys())

    out = dict(variables)
    missing, mismatched = [], []
    for name in variables:
        lookup = (translate_name(name, translate_prefix, import_prefix)
                  if translate_prefix else name)
        if _OPTIMIZER_PAT.search(lookup):
            continue
        if lookup not in weights and lookup.replace("/", "_", 1) in weights:
            lookup = lookup.replace("/", "_", 1)
        if lookup not in weights:
            if name == "global_step":
                continue
            missing.append(name)
            if warnings:
                print(f"WARNING: {lookup} not found in saved weights")
            continue
        value = weights[lookup]
        if tuple(value.shape) != tuple(np.shape(variables[name])):
            # Mismatches are skipped with a warning, never fatal — the
            # cross-modal finetuning path depends on that
            # (reference base_model.py:438-445, finetuning.py:40-92).
            mismatched.append(name)
            if warnings:
                print(f"WARNING: wrong shape found for {lookup}, skipped"
                      f"{' (chill mode)' if chill_mode else ''}")
                print("stored shape:", value.shape,
                      "expected shape:", np.shape(variables[name]))
            continue
        out[name] = np.asarray(value, np.float32)
    return out, {"missing": missing, "mismatched": mismatched}
