"""List-directed ASCII results writer/reader.

Format-compatible with the reference's write_results_LD / read_results_LD
(reference RAYS_project/RAYS_lib/ray_results_m.f90:365-420): alternating
name line / list-directed value lines, arrays flattened in Fortran column
order (ray_vec written as (nv, pts, nray)).
"""

from __future__ import annotations

import datetime

import numpy as np

from rays_tpu.tracing.stop import flag_string


def _w(f, name, values):
    f.write(f" {name}\n")
    arr = np.atleast_1d(np.asarray(values)).ravel()
    if arr.dtype.kind in "US":
        f.write(" " + " ".join(str(v) for v in arr) + "\n")
    elif arr.dtype.kind in "iu":
        f.write(" " + " ".join(str(int(v)) for v in arr) + "\n")
    else:
        f.write(" " + " ".join(f"{float(v):.17g}" for v in arr) + "\n")


def write_results_ld(cfg, results, total_trace_time=0.0, path=None):
    nray = int(results.npoints.shape[0])
    npoints = np.asarray(results.npoints)
    nv = int(results.ray_vec.shape[-1])
    actual_max = int(npoints.max())
    fname = path or f"run_results.{cfg.run_label}"
    now = datetime.datetime.now()
    date_vec = [now.year, now.month, now.day, 0, now.hour, now.minute,
                now.second, now.microsecond // 1000]
    with open(fname, "w") as f:
        _w(f, "RAYS_run_label", [cfg.run_label])
        _w(f, "date_vector", date_vec)
        _w(f, "number_of_rays", [nray])
        _w(f, "max_number_of_points", [actual_max])
        _w(f, "dim_v_vector", [nv])
        _w(f, "npoints", npoints)
        _w(f, "total_trace_time", [total_trace_time])
        _w(f, "initial_ray_power", results.initial_ray_power)
        _w(f, "ray_trace_time", np.zeros(nray))
        _w(f, "end_ray_parameter", results.end_ray_parameter)
        _w(f, "end_residuals", results.end_residuals)
        _w(f, "max_residuals", results.max_residuals)
        _w(f, "ray_stop_flag",
           [flag_string(int(s)).replace(" ", "_") or "OK"
            for s in np.asarray(results.stop_flag)])
        # Fortran column order: (nv, nray) and (nv, pts, nray)
        _w(f, "start_ray_vec", np.asarray(results.start_ray_vec).T)
        _w(f, "end_ray_vec", np.asarray(results.end_ray_vec).T)
        _w(f, "residual",
           np.asarray(results.residual)[:, :actual_max].T)
        _w(f, "ray_vec",
           np.transpose(np.asarray(results.ray_vec)[:, :actual_max, :],
                        (2, 1, 0)))
    return fname


def read_results_ld(path):
    """Read back into a dict of arrays (shapes restored to C order)."""
    with open(path) as f:
        tokens = f.read().split("\n")
    data = {}
    i = 0
    while i < len(tokens):
        name = tokens[i].strip()
        if not name:
            i += 1
            continue
        vals = tokens[i + 1].split()
        data[name] = vals
        i += 2

    def farr(name):
        return np.asarray([float(v) for v in data[name]])

    out = {
        "RAYS_run_label": data["RAYS_run_label"][0],
        "number_of_rays": int(data["number_of_rays"][0]),
        "max_number_of_points": int(data["max_number_of_points"][0]),
        "dim_v_vector": int(data["dim_v_vector"][0]),
        "npoints": np.asarray([int(v) for v in data["npoints"]]),
        "total_trace_time": float(data["total_trace_time"][0]),
        "initial_ray_power": farr("initial_ray_power"),
        "end_ray_parameter": farr("end_ray_parameter"),
        "end_residuals": farr("end_residuals"),
        "max_residuals": farr("max_residuals"),
        "ray_stop_flag": data["ray_stop_flag"],
    }
    nray, pts, nv = (out["number_of_rays"], out["max_number_of_points"],
                     out["dim_v_vector"])
    out["start_ray_vec"] = farr("start_ray_vec").reshape(nray, nv)
    out["end_ray_vec"] = farr("end_ray_vec").reshape(nray, nv)
    out["residual"] = farr("residual").reshape(nray, pts)
    out["ray_vec"] = farr("ray_vec").reshape(nray, pts, nv)
    return out
