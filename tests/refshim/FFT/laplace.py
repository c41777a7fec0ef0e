# Executes the upstream reference laplace module in this namespace (oracle only).
_p = "/root/reference/laplace.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
