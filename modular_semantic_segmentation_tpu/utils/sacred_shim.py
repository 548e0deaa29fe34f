"""Minimal sacred-compatible experiment runner.

The reference manages every CLI entry point with ``sacred`` (Experiment,
observers, ``with config.yaml key=value`` CLI grammar, run records with
config/info/artifacts — SURVEY.md §2.6/2.7). sacred is not available in
this environment, so this shim provides the subset the framework uses, with
the same FileStorageObserver on-disk layout (run.json / config.json /
info.json / cout.txt / artifacts) so ExperimentData and ``rerun`` work
identically. If real sacred is importable it is used instead (see
__init__ fallthrough at the bottom).

CLI grammar: ``python -m experiments.<mod> [command] with cfg.yaml k=v ...``
"""

import io
import json
import inspect
import os
import shutil
import sys

import numpy as np
import yaml


def _parse_value(text):
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _set_dotted(config, key, value):
    parts = key.split(".")
    node = config
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return {"py/object": "numpy.ndarray", "values": obj.tolist(),
                "dtype": str(obj.dtype)}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


class FileStorageObserver:
    """Writes sacred-layout run directories."""

    def __init__(self, basedir):
        self.basedir = basedir
        os.makedirs(basedir, exist_ok=True)

    @classmethod
    def create(cls, basedir):
        return cls(basedir)

    def next_id(self):
        existing = [int(d) for d in os.listdir(self.basedir) if d.isdigit()]
        return max(existing, default=0) + 1

    def start_run(self, run):
        run_dir = os.path.join(self.basedir, str(run._id))
        os.makedirs(run_dir, exist_ok=True)
        run._dir = run_dir
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            json.dump(_jsonable(run.config), f, indent=2, default=str)
        # run.json/info.json skeletons at START (status RUNNING), so a
        # run killed mid-fit (OOM, preemption, SIGKILL) is still loadable
        # by ExperimentData and recoverable with `training resume`;
        # finish_run overwrites both. Real sacred records RUNNING status
        # the same way.
        record = {
            "_id": run._id,
            "status": "RUNNING",
            "command": run.command,
            "artifacts": [],
            "experiment": {"name": run.experiment_name,
                           "mainfile": run.mainfile},
        }
        with open(os.path.join(run_dir, "run.json"), "w") as f:
            json.dump(_jsonable(record), f, indent=2, default=str)
        with open(os.path.join(run_dir, "info.json"), "w") as f:
            json.dump({}, f)

    def save_artifact(self, run, filepath, name=None):
        name = name or os.path.basename(filepath)
        shutil.copy(filepath, os.path.join(run._dir, name))
        run.artifacts.append({"name": name})

    def finish_run(self, run, status="COMPLETED"):
        run_dir = run._dir
        with open(os.path.join(run_dir, "info.json"), "w") as f:
            json.dump(_jsonable(run.info), f, indent=2, default=str)
        with open(os.path.join(run_dir, "cout.txt"), "w") as f:
            f.write(run.captured_out)
        record = {
            "_id": run._id,
            "status": status,
            "command": run.command,
            "artifacts": run.artifacts,
            "experiment": {"name": run.experiment_name,
                           "mainfile": run.mainfile},
        }
        with open(os.path.join(run_dir, "run.json"), "w") as f:
            json.dump(_jsonable(record), f, indent=2, default=str)


class Run:
    def __init__(self, run_id, config, command, experiment_name, mainfile):
        self._id = run_id
        self.config = config
        self.info = {}
        self.command = command
        self.experiment_name = experiment_name
        self.mainfile = mainfile
        self.artifacts = []
        self.captured_out = ""
        self._dir = None


class _Tee(io.TextIOBase):
    def __init__(self, stream, buffer):
        self.stream = stream
        self.buffer = buffer

    def write(self, text):
        self.stream.write(text)
        self.buffer.write(text)
        return len(text)

    def flush(self):
        self.stream.flush()


class Experiment:
    def __init__(self, name=None):
        frame = inspect.stack()[1]
        self.mainfile = os.path.basename(frame.filename)
        self.name = name or os.path.splitext(self.mainfile)[0]
        self.observers = []
        self.captured_out_filter = None
        self.commands = {}
        self.main_fn = None
        self.info = {}
        self.current_run = None

    # ------------------------------------------------------------ decorators
    def main(self, fn):
        self.main_fn = fn
        self.commands["main"] = fn
        return fn

    def automain(self, fn):
        return self.main(fn)

    def command(self, fn):
        self.commands[fn.__name__] = fn
        return fn

    def capture(self, fn):
        """Captured functions get missing args injected from the run
        config."""
        def wrapper(*args, **kwargs):
            return self._call_with_config(fn, self.current_run, args, kwargs)
        wrapper.__name__ = fn.__name__
        wrapper._wrapped = fn
        return wrapper

    # -------------------------------------------------------------- plumbing
    def _call_with_config(self, fn, run, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        sig = inspect.signature(fn)
        params = list(sig.parameters)
        bound = params[:len(args)]
        for name in params[len(args):]:
            if name in kwargs:
                continue
            if name == "_run":
                kwargs["_run"] = run
            elif run is not None and name in run.config:
                kwargs[name] = run.config[name]
            elif sig.parameters[name].default is not inspect.Parameter.empty:
                continue
            else:
                raise TypeError(
                    f"config value '{name}' required by {fn.__name__} not "
                    "found (provide it via 'with cfg.yaml key=value')")
        del bound
        return fn(*args, **kwargs)

    def add_artifact(self, filepath, name=None):
        for observer in self.observers:
            observer.save_artifact(self.current_run, filepath, name)

    # ------------------------------------------------------------------ runs
    def run(self, command_name="main", config_updates=None):
        config = dict(config_updates or {})
        # sacred semantics: every run has a seed — auto-generated when not
        # given, RECORDED in config.json, and used to seed the global
        # python/numpy rngs at run start (sacred/randomness.py). Host
        # augmentation draws from those globals (datasets/augmentation.py,
        # as the reference's does), so a recorded run replays exactly
        # through `experiments.rerun with experiment_id=...`.
        if "seed" not in config:
            import secrets
            config["seed"] = secrets.randbelow(2 ** 31)
        import random as _random

        import numpy as _np
        _random.seed(config["seed"])
        _np.random.seed(config["seed"] % 2 ** 32)
        fn = self.commands[command_name]
        run_id = None
        for observer in self.observers:
            run_id = observer.next_id()
        run = Run(run_id, config, command_name, self.name, self.mainfile)
        self.current_run = run
        for observer in self.observers:
            observer.start_run(run)

        buffer = io.StringIO()
        old_stdout = sys.stdout
        sys.stdout = _Tee(old_stdout, buffer)
        status = "COMPLETED"
        try:
            result = self._call_with_config(fn, run)
        except BaseException:
            status = "FAILED"
            raise
        finally:
            sys.stdout = old_stdout
            run.captured_out = buffer.getvalue()
            if self.captured_out_filter:
                run.captured_out = self.captured_out_filter(run.captured_out)
            for observer in self.observers:
                observer.finish_run(run, status)
        return result

    def run_commandline(self, argv=None):
        argv = list(sys.argv[1:] if argv is None else argv)
        command = "main"
        config = {}
        i = 0
        if argv and argv[0] != "with" and not argv[0].startswith("-"):
            command = argv[0]
            i = 1
        while i < len(argv):
            arg = argv[i]
            if arg == "with":
                i += 1
                continue
            if arg in ("-u", "--unobserved"):
                self.observers = []
                i += 1
                continue
            if "=" in arg:
                key, _, value = arg.partition("=")
                _set_dotted(config, key, _parse_value(value))
            elif arg.endswith((".yaml", ".yml", ".json")):
                with open(arg) as f:
                    loaded = (json.load(f) if arg.endswith(".json")
                              else yaml.safe_load(f))
                for key, value in (loaded or {}).items():
                    config.setdefault(key, value)
            i += 1
        return self.run(command, config)


def apply_backspaces_and_linefeeds(text):
    """Collapse progress-bar control characters (sacred.utils)."""
    lines = []
    for raw in text.split("\n"):
        line = []
        for ch in raw.split("\r")[-1]:
            if ch == "\b":
                if line:
                    line.pop()
            else:
                line.append(ch)
        lines.append("".join(line))
    return "\n".join(lines)
