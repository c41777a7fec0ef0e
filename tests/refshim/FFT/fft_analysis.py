# Executes the upstream reference module in this namespace (test oracle only).
_p = "/root/reference/fft_analysis.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
