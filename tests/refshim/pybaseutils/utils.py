"""NumPy stand-ins for the private pybaseutils helpers the reference imports.

Implemented from the reference call-site semantics; used only to execute the
reference sources as a golden oracle in tests.
"""
import numpy as np


def detrend_none(x, axis=None):
    return x


def detrend_mean(x, axis=None):
    x = np.asarray(x)
    if axis is None:
        return x - x.mean()
    return x - np.mean(x, axis=axis, keepdims=True)


def detrend_linear(x, axis=0):
    x = np.asarray(x, dtype=float)
    if x.ndim == 1:
        n = x.shape[0]
        t = np.arange(n) - (n - 1) / 2.0
        slope = np.dot(t, x - x.mean()) / np.dot(t, t)
        return x - x.mean() - slope * t
    return np.apply_along_axis(detrend_linear, axis, x)


def interp(xi, yi, ei=None, xo=None):
    xi = np.asarray(xi)
    yi = np.asarray(yi)
    if xo is None:
        xo = xi
    xo = np.asarray(xo)
    if yi.ndim == 1:
        yo = np.interp(xo, xi, yi)
    else:
        yo = np.stack([np.interp(xo, xi, yi[:, c]) for c in range(yi.shape[1])],
                      axis=1)
    if ei is None:
        return yo
    eo = np.interp(xo, xi, np.asarray(ei))
    return yo, eo


def trapz_var(x, y, ey=None, vary=None, dim=0):
    x = np.asarray(x)
    y = np.moveaxis(np.asarray(y), dim, 0)
    n = y.shape[0]
    dx = np.diff(x)
    w = np.zeros((n,))
    w[:-1] += 0.5 * dx
    w[1:] += 0.5 * dx
    wb = w.reshape((n,) + (1,) * (y.ndim - 1))
    integral = np.sum(wb * y, axis=0)
    if vary is None:
        var = np.zeros_like(integral)
    else:
        vary = np.moveaxis(np.asarray(vary), dim, 0)
        var = np.sum((wb ** 2) * vary, axis=0)
    return integral, var, None, None


def sliding_window_1d(t, x, win, ss=None, ind_only=False):
    t = np.asarray(t)
    x = np.asarray(x)
    if ss is None or ss == 0:
        ss = win
    ss = int(ss)
    win = int(win)
    n = x.shape[0]
    nwin = 1 + (n - win) // ss if n >= win else 0
    starts = np.arange(nwin) * ss
    if ind_only:
        return np.stack([starts, starts + win], axis=-1)
    idx = starts[:, None] + np.arange(win)[None, :]
    xw = x[idx]
    tw = t[idx]
    tc = tw.mean(axis=-1)
    return tw, xw, tc


def reshapech(x):
    x = np.asarray(x)
    if x.ndim == 1:
        return x[:, None]
    if x.shape[0] == 1:
        return x.T
    return x


def rect(x):
    x = np.asarray(x)
    ax = np.abs(x)
    return np.where(ax < 0.5, 1.0, np.where(ax == 0.5, 0.5, 0.0))


def delta(x):
    x = np.asarray(x)
    return np.where(x == 0.0, 1.0, 0.0)
