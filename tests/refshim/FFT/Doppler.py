# Executes the upstream reference Doppler module in this namespace
# (test oracle only).
_p = "/root/reference/Doppler.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
