"""Minimal Struct stand-in so the reference sources can be imported for
golden parity testing (test infrastructure only)."""


class Struct(object):
    def __init__(self, d=None):
        if d is not None:
            if not isinstance(d, dict):
                d = d.dict_from_class()
            self.__dict__.update(d)

    def dict_from_class(self):
        return dict(self.__dict__)
