"""Execute the notebooks (SURVEY.md L5) in CI.

The reference's notebook layer is *executable* reproduction —
`Experimental Details.ipynb` drives ExperimentData against stored runs.
Stored outputs alone let code cells rot silently (the drift class
SURVEY.md §2.9 documents in the reference's own notebooks), so these
tests run every notebook end-to-end with ``nbconvert --execute`` against
a throwaway copy of ``notebooks/demo_storage`` and assert no cell
errored. The Synthia table notebook is additionally cross-checked
against a fresh ``experiments.report.build_quality_table`` over the same
storage: the numbers the notebook renders must be the numbers the report
module computes today.

Execution env: CPU-pinned (the notebooks' run_cli helpers honor
JAX_PLATFORMS), MSSTPU_NB_SMALL=1 (the timing notebook's reduced-shape
mode — full-shape TPU timing is bench.py's job), storage redirected via
the env vars the notebooks' first cell setdefaults.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_DIR = os.path.join(REPO, "notebooks")

NOTEBOOKS = [
    "Experimental Details.ipynb",
    "Synthia Rand Cityscapes Examples.ipynb",
    "Inference Time.ipynb",
    "Cityscapes.ipynb",
]


@pytest.fixture(scope="module")
def nb_env(tmp_path_factory):
    """Copy demo_storage to a tmp dir and point the notebook env at it,
    so executions can't mutate the committed storage."""
    storage = tmp_path_factory.mktemp("nb_storage")
    shutil.copytree(os.path.join(NB_DIR, "demo_storage"),
                    storage / "demo_storage")
    env = dict(os.environ)
    env["EXPERIMENT_STORAGE_FOLDER"] = str(
        storage / "demo_storage" / "experiments")
    env["EXP_OUT"] = str(storage / "demo_storage" / "exp")
    env["DATA_BASEPATH"] = str(storage / "demo_storage" / "data")
    env["JAX_PLATFORMS"] = "cpu"
    env["MSSTPU_NB_SMALL"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_nb_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    return env


def execute_notebook(name, env, timeout=900):
    """nbconvert --execute the notebook; returns the executed notebook
    dict (the file on disk is untouched — output goes to stdout)."""
    result = subprocess.run(
        [sys.executable, "-m", "nbconvert", "--to", "notebook",
         "--execute", "--stdout", name],
        cwd=NB_DIR, env=env, capture_output=True, text=True,
        timeout=timeout)
    assert result.returncode == 0, \
        f"{name} failed to execute:\n{result.stderr[-4000:]}"
    return json.loads(result.stdout)


def cell_output_text(nb, source_substring):
    """All output text of the first code cell whose source contains the
    given substring."""
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        if source_substring not in "".join(cell["source"]):
            continue
        chunks = []
        for out in cell.get("outputs", []):
            if "text" in out:
                chunks.append("".join(out["text"]))
            for mime, data in out.get("data", {}).items():
                if mime.startswith("text/"):
                    chunks.append("".join(data))
        return "\n".join(chunks)
    raise AssertionError(f"no cell matching {source_substring!r}")


def test_experimental_details_executes(nb_env):
    """Record/summary/weights/zip-dump inspection flow runs clean (the
    reference's Experimental Details.ipynb replay contract)."""
    nb = execute_notebook("Experimental Details.ipynb", nb_env)
    text = cell_output_text(nb, "get_record()")
    assert "status:" in text


def test_synthia_table_matches_report_module(nb_env):
    """The notebook's rendered Table-I numbers are the numbers
    experiments.report computes over the same storage right now."""
    nb = execute_notebook("Synthia Rand Cityscapes Examples.ipynb", nb_env)
    table_text = cell_output_text(nb, "build_quality_table")

    probe = (
        "import os, json\n"
        "from experiments.report import build_quality_table\n"
        "folder = os.environ['EXPERIMENT_STORAGE_FOLDER']\n"
        "runs = sorted(int(d) for d in os.listdir(folder) if d.isdigit())\n"
        "table = build_quality_table({'bayes': runs[2], "
        "'average': runs[3]})\n"
        "print(json.dumps(json.loads(table.to_json())))\n")
    result = subprocess.run([sys.executable, "-c", probe], cwd=REPO,
                            env=nb_env, capture_output=True, text=True,
                            timeout=300)
    assert result.returncode == 0, result.stderr[-2000:]
    table = json.loads(result.stdout.strip().splitlines()[-1])
    values = [v for column in table.values() for v in column.values()
              if v is not None]
    assert values, "report table came back empty"
    for value in values:
        rendered = f"{value:.4f}"
        assert rendered in table_text, \
            f"report value {rendered} not in the notebook's table:\n" \
            f"{table_text[:2000]}"


def test_inference_time_executes(nb_env):
    """The timing notebook re-runs the timing CLI (reduced shape) and
    rebuilds its table from the fresh runs."""
    nb = execute_notebook("Inference Time.ipynb", nb_env)
    text = cell_output_text(nb, "build_timing_table")
    assert "rgb_fcn" in text and "speedup" in text


def test_cityscapes_notebook_executes(nb_env):
    """Executes clean; without Cityscapes data on disk the table cell
    reports the skip instead of erroring (data-gated, like the
    reference's notebook against its lab-internal corpus)."""
    nb = execute_notebook("Cityscapes.ipynb", nb_env)
    text = cell_output_text(nb, "HAVE_CITYSCAPES")
    assert text  # the gate cell printed its verdict
