# Executes the upstream reference hilbert module in this namespace
# (test oracle only).
_p = "/root/reference/hilbert.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
