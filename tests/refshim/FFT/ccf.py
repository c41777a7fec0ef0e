# Executes the upstream reference ccf module in this namespace (oracle only).
_p = "/root/reference/ccf.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
