#!/usr/bin/env python3
"""Extract mean_/scale_ vectors from the reference's shipped sklearn
StandardScaler joblib artifacts into tools/scaler_vectors.json — the
fixture graft.ml.ScalerDrift compares engine descriptor stats against.

Driver-side tooling only (like oracle_check.py): the engine itself has no
Python dependency. Uses a restricted unpickler (sklearn classes stubbed,
only numpy array reconstruction allowed) and replicates joblib's on-disk
framing, where each NumpyArrayWrapper's raw bytes follow the pickle
object in the stream."""
import pickle, io, json
import numpy as np
from numpy.core import multiarray

class StubScaler:
    pass

class NumpyArrayWrapper:
    def __init__(self):
        pass

class RestrictedUnpickler(pickle._Unpickler):
    def __init__(self, fh):
        super().__init__(fh)
        self.fh = fh

    def find_class(self, module, name):
        if module.startswith("sklearn"):
            return StubScaler
        if module == "joblib.numpy_pickle" and name == "NumpyArrayWrapper":
            return NumpyArrayWrapper
        if module.startswith("numpy"):
            # exact allowlist, no getattr fallback: any other numpy callable
            # (np.load with allow_pickle, etc.) reachable from a REDUCE
            # opcode would defeat the sandbox this unpickler exists for
            table = {"_reconstruct": multiarray._reconstruct,
                     "scalar": multiarray.scalar,
                     "dtype": np.dtype, "ndarray": np.ndarray}
            if name in table:
                return table[name]
        raise pickle.UnpicklingError(f"forbidden {module}.{name}")

    def load_build(self):
        super().load_build()
        obj = self.stack[-1]
        if isinstance(obj, NumpyArrayWrapper):
            st = obj.__dict__
            dtype = np.dtype(st["dtype"])
            shape = st["shape"]
            count = int(np.prod(shape)) if shape else 1
            data = self.fh.read(count * dtype.itemsize)
            arr = np.frombuffer(data, dtype=dtype)
            if shape:
                arr = arr.reshape(shape)
            self.stack[-1] = arr

    dispatch = pickle._Unpickler.dispatch.copy()
    dispatch[pickle.BUILD[0]] = load_build

def main():
    out = {}
    for m in ["el_comp", "el_comp_st", "ion_comp", "ion_comp_st"]:
        p = f"/root/reference/oxi_diel_db/prediction_model/{m}_scaler.joblib"
        obj = RestrictedUnpickler(io.BytesIO(open(p, "rb").read())).load()
        d = obj.__dict__
        out[m] = {"mean": [float(x) for x in d["mean_"]],
                  "scale": [float(x) for x in d["scale_"]]}
        print(m, "n_features:", len(out[m]["mean"]))
    json.dump(out, open("/root/repo/tools/scaler_vectors.json", "w"), indent=1)

if __name__ == "__main__":
    main()
