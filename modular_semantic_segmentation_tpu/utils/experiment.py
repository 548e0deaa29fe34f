"""Experiment storage/config layer (reference experiments/utils.py).

ExperimentData loads any past run's config/info/artifacts/weights from the
FileStorage layout (directory or zip; MongoDB if pymongo is installed and
configured), so experiments compose across runs — fusion models can load
expert weights and confusion matrices by experiment id.
"""

import json
import os
import zipfile
from copy import deepcopy
from os import path, listdir

import numpy as np

from modular_semantic_segmentation_tpu import settings


def get_observer():
    """Pick the observer backend from settings
    (reference experiments/utils.py:25-37)."""
    if settings.EXPERIMENT_DB_HOST:
        try:
            from sacred.observers import MongoObserver
            return MongoObserver.create(
                url="mongodb://{user}:{pwd}@{host}/{db}".format(
                    host=settings.EXPERIMENT_DB_HOST,
                    user=settings.EXPERIMENT_DB_USER,
                    pwd=settings.EXPERIMENT_DB_PWD,
                    db=settings.EXPERIMENT_DB_NAME),
                db_name=settings.EXPERIMENT_DB_NAME)
        except ImportError:
            print("WARNING: DB settings found but no mongo support; "
                  "falling back to file storage")
    from modular_semantic_segmentation_tpu.utils.sacred_shim import \
        FileStorageObserver
    return FileStorageObserver.create(settings.EXPERIMENT_STORAGE_FOLDER)


# alias kept because several reference scripts import it by this name
# (finetuning.py:7, ibcc_fusion.py:3, uncertainty_eval.py:12)
get_mongo_observer = get_observer


def load_data(data_config):
    """Instantiate the dataset described by a data_config dict
    (reference experiments/utils.py:16-22)."""
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    params = {key: val for key, val in data_config.items()
              if key not in ["dataset", "name", "use_trainset"]}
    name = data_config.get("dataset", data_config.get("name"))
    return get_dataset(name)(**params)


def data_description(data_config):
    """Data description for the dataset named in a data_config dict,
    honoring its optional ``num_classes`` override.

    The reference's ``get_data_description(num_classes=...)`` escape hatch
    (reference data_baseclass.py:46-48) exists exactly for configs that
    change the class count, but its CLIs never wired it up — every
    experiment called the classmethod bare, so a dataset configured with a
    non-default class count silently built a model with the default. All
    our experiment entry points route through this helper instead.
    """
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    name = data_config.get("dataset", data_config.get("name"))
    return get_dataset(name).get_data_description(
        num_classes=data_config.get("num_classes"))


def reverse_convert_datatypes(data):
    """Undo the JSON encoding of numpy values in stored records
    (reference experiments/utils.py:40-58)."""
    if isinstance(data, dict):
        if "values" in data and len(data) == 1:
            return reverse_convert_datatypes(data["values"])
        if "py/tuple" in data and len(data) == 1:
            return reverse_convert_datatypes(data["py/tuple"])
        if data.get("py/object") == "numpy.ndarray":
            if "dtype" in data:
                return np.array(data["values"], dtype=data["dtype"])
            return np.array(data["values"])
        return {key: reverse_convert_datatypes(val)
                for key, val in data.items()}
    if isinstance(data, list):
        return [reverse_convert_datatypes(item) for item in data]
    return data


class ExperimentData:
    """Uniform accessor for a past run's record and artifacts.

    Three backends, matching the reference (experiments/utils.py:61-104):
    MongoDB + GridFS when the EXPERIMENT_DB_* settings are configured and
    pymongo is importable (sacred MongoObserver document layout:
    ``db.runs`` keyed by ``_id``, artifacts as {name, file_id} GridFS
    references), otherwise the FileStorage directory layout, otherwise a
    ``<id>.zip`` archive of the same layout.
    """

    def __init__(self, exp_id):
        if settings.EXPERIMENT_DB_HOST and self._try_load_mongo(exp_id):
            return
        folder = settings.EXPERIMENT_STORAGE_FOLDER
        if str(exp_id) in listdir(folder):
            self.exp_path = path.join(folder, str(exp_id))
            with open(path.join(self.exp_path, "run.json")) as f:
                record = json.load(f)
            # real-sacred FileStorageObserver only writes info.json when
            # the run set any info (sacred/observers/file_storage.py), and
            # records published by the reference's authors follow that
            # layout — keep whatever run.json already carries as fallback
            info_path = path.join(self.exp_path, "info.json")
            if path.exists(info_path):
                with open(info_path) as f:
                    record["info"] = json.load(f)
            else:
                record.setdefault("info", {})
            with open(path.join(self.exp_path, "config.json")) as f:
                record["config"] = json.load(f)
            cout = path.join(self.exp_path, "cout.txt")
            record["captured_out"] = (open(cout).read()
                                      if path.exists(cout) else "")
            self.artifacts = listdir(self.exp_path)
        elif f"{exp_id}.zip" in listdir(folder):
            self.zipfile = path.join(folder, f"{exp_id}.zip")
            with zipfile.ZipFile(self.zipfile) as archive:
                names = archive.namelist()
                record = json.loads(archive.read("run.json").decode("utf8"))
                if "info.json" in names:
                    record["info"] = json.loads(
                        archive.read("info.json").decode("utf8"))
                else:
                    record.setdefault("info", {})
                record["config"] = json.loads(
                    archive.read("config.json").decode("utf8"))
                if "cout.txt" in names:
                    record["captured_out"] = archive.read(
                        "cout.txt").decode("utf8", errors="replace")
                self.artifacts = names
        else:
            raise UserWarning(f"Specified experiment {exp_id} not found.")
        self.record = record

    def _try_load_mongo(self, exp_id):
        """Load the run document + GridFS artifact index from the sacred
        MongoObserver layout (reference experiments/utils.py:63-78).
        Returns False (→ file-storage fallback) when pymongo is absent,
        the server is unreachable, or the id is not in ``db.runs``."""
        try:
            import gridfs
            import pymongo
        except ImportError:
            print("WARNING: DB settings found but no mongo support; "
                  "falling back to file storage")
            return False
        try:
            client = pymongo.MongoClient(
                "mongodb://{user}:{pwd}@{host}/{db}".format(
                    host=settings.EXPERIMENT_DB_HOST,
                    user=settings.EXPERIMENT_DB_USER,
                    pwd=settings.EXPERIMENT_DB_PWD,
                    db=settings.EXPERIMENT_DB_NAME))
            db = client[settings.EXPERIMENT_DB_NAME]
            record = db.runs.find_one({"_id": int(exp_id)})
        except Exception as error:  # unreachable server, bad credentials …
            print(f"WARNING: mongo backend failed ({error}); "
                  "falling back to file storage")
            return False
        if record is None:
            return False
        self._mongo_runs = db.runs
        self._gridfs = gridfs.GridFS(db)
        self._artifact_ids = {a["name"]: a["file_id"]
                              for a in record.get("artifacts", [])}
        record["artifacts"] = list(self._artifact_ids)
        record.setdefault("info", {})
        record.setdefault("config", {})
        record.setdefault("captured_out", "")
        self.artifacts = list(self._artifact_ids)
        self.record = record
        return True

    def get_record(self):
        return reverse_convert_datatypes(deepcopy(self.record))

    def get_artifact(self, name):
        """Return the artifact with the given name as a file path (dir
        backend) or file-like object (zip and mongo/GridFS backends)."""
        if name not in self.artifacts:
            raise UserWarning(f"ERROR: Artifact {name} not found")
        if hasattr(self, "_gridfs"):
            return self._gridfs.get(self._artifact_ids[name])
        if hasattr(self, "exp_path"):
            return path.join(self.exp_path, name)
        archive = zipfile.ZipFile(self.zipfile)
        return archive.open(name)

    def get_summary(self, tag):
        """pd.Series of a scalar summary tag from the run's stored
        training curves.

        Reads our summaries.jsonl when present; otherwise falls back to
        the reference's TF event files (the layout of its published
        experimental_data.tar.gz runs, reference experiments/utils.py:
        130-149) via the pure-Python reader in utils/tfevents.py — no
        TensorFlow required."""
        from pandas import Series
        search = [a for a in self.artifacts if "summaries" in a]
        if search:
            steps, values = [], []
            fobj = self.get_artifact(search[0])
            if isinstance(fobj, str):
                with open(fobj) as f:
                    lines = f.read().splitlines()
            else:
                # zip/GridFS file-likes iterate by chunks, not lines
                lines = fobj.read().decode("utf8").splitlines()
            for line in lines:
                if not line.strip():
                    continue
                record = json.loads(line)
                if tag in record:
                    steps.append(record["step"])
                    values.append(record[tag])
            return Series(values, index=steps)
        events = [a for a in self.artifacts if "events" in a]
        if not events:
            raise UserWarning("ERROR: Could not find summary file")
        from modular_semantic_segmentation_tpu.utils.tfevents import \
            iter_scalar_events
        fobj = self.get_artifact(events[0])
        steps, values = [], []
        if isinstance(fobj, str):
            fobj = open(fobj, "rb")
        with fobj:
            for event in iter_scalar_events(fobj):
                if event.tag == tag:
                    steps.append(event.step)
                    values.append(event.simple_value)
        return Series(values, index=steps)

    def get_weights(self):
        """Path/file of the first stored weights artifact."""
        filename = next(a for a in self.artifacts if "weights" in a)
        return self.get_artifact(filename)

    def dump(self, out_path):
        """Dump the record and artifacts as a zip archive."""
        if not out_path.endswith(".zip"):
            out_path = out_path + ".zip"
        with zipfile.ZipFile(out_path, "w") as archive:
            record = deepcopy(self.record)
            for name in self.artifacts:
                if name.endswith((".json", ".txt")):
                    continue
                src = self.get_artifact(name)
                if isinstance(src, str):
                    archive.write(src, name)
                else:
                    archive.writestr(name, src.read())
            archive.writestr("config.json", json.dumps(record["config"],
                                                       default=str))
            archive.writestr("cout.txt", record.get("captured_out", ""))
            archive.writestr("info.json", json.dumps(record["info"],
                                                     default=str))
            record.pop("config", None)
            record.pop("captured_out", None)
            record.pop("info", None)
            archive.writestr("run.json", json.dumps(record, default=str))
        return out_path

    def update_record(self, changes):
        """Apply changes to the stored record (dir and mongo backends,
        reference experiments/utils.py:180-185)."""
        self.record.update(changes)
        if hasattr(self, "_mongo_runs"):
            self._mongo_runs.update_one(
                {"_id": self.record["_id"]},
                {"$set": {key: self.record[key] for key in changes}})
            return
        assert hasattr(self, "exp_path"), \
            "update_record only supported for directory or mongo storage"
        with open(path.join(self.exp_path, "info.json"), "w") as f:
            json.dump(self.record["info"], f, indent=2, default=str)
