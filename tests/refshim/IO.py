# Stub of the reference's private `IO` package: HeatPulse_Funcs.py imports it
# at module level (HeatPulse_Funcs.py:24) but the compute paths under golden
# test never call it.  Only the names looked up at import time exist here.


def loadHDF5(*a, **k):  # pragma: no cover - never exercised in goldens
    raise NotImplementedError("private IO.loadHDF5 stub")


class saveHDF5:  # pragma: no cover
    @staticmethod
    def __recursively_save_dict_contents_to_group__(*a, **k):
        raise NotImplementedError("private IO.saveHDF5 stub")
