# Executes the upstream reference PCA module in this namespace (oracle only).
_p = "/root/reference/PCA.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
