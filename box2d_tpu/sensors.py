"""Sensor overlap pass: begin/end events from a persistent visitor-set diff.

Counterpart of ref: src/Sensor.cs:22-236 — after the solve, every sensor
shape queries for overlapping shapes (GJK distance < 10*eps with radii,
visitor must enable sensor events, not same body, filter pass) and the
sorted visitor set is diffed against the previous step's to emit begin/end
events. Here the sensor list is static (shapes are fixed at build), so the
pass is a dense (n_sensors, S) vmapped GJK gated out entirely for scenes
without sensors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import math2d as m
from .constants import FLT_EPSILON
from .distance import shape_cast_pair, shape_distance
from .state import Capacity, WorldState


def sensor_shape_ids(shapes_host) -> tuple:
    """Host-side: static tuple of sensor shape indices."""
    return tuple(i for i, s in enumerate(shapes_host) if s["is_sensor"])


def sensor_pass(state: WorldState, cap: Capacity, sensor_ids: tuple,
                prev_origin=None, prev_rot=None):
    """Compute sensor begin/end events + the new persistent overlap keys.

    prev_origin/prev_rot: pre-step body poses. When given, each visitor is
    ALSO shape-cast from its pre-step pose along its step motion against the
    sensor, so a fast body that passes completely through a sensor within
    one step still registers (ref: src/Solver.cs:1275-1292 sensor TOI hits
    collected during the continuous pass)."""
    if not sensor_ids:
        return state

    sh = state.shapes
    b = state.bodies
    sid = jnp.asarray(sensor_ids, jnp.int32)
    S = sh.type.shape[0]
    p = b.origin[sh.body]
    q = b.rot[sh.body]

    def overlaps_for_sensor(s):
        sv, sc, sr = sh.verts[s], sh.count[s], sh.radius[s]
        sp, sq = p[s], q[s]

        def one(ov, oc, orad, op, oq):
            out = shape_distance(sv, sc, sr, ov, oc, orad, sp, sq, op, oq,
                                 use_radii=True)
            return out.distance < 10.0 * FLT_EPSILON

        hit = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
        if prev_origin is not None:
            pv = prev_origin[sh.body]
            qv = prev_rot[sh.body]

            def one_cast(ov, oc, orad, opv, oqv, opn):
                out = shape_cast_pair(sv, sc, sr, ov, oc, orad,
                                      sp, sq, opv, oqv, opn - opv,
                                      jnp.float32(1.0))
                return out.hit

            swept = jax.vmap(one_cast)(sh.verts, sh.count, sh.radius,
                                       pv, qv, p)
            # only count the swept test for bodies that actually moved a
            # meaningful distance this step (otherwise the distance test
            # above is authoritative)
            moved = m.length(p - pv) > 0.25 * b.min_extent[sh.body]
            hit = hit | (swept & moved)
        same_body = sh.body == sh.body[s]
        grp = sh.filter_group
        same_group = (grp == grp[s]) & (grp != 0)
        filt = jnp.where(
            same_group, grp > 0,
            ((sh.filter_category[s] & sh.filter_mask) != 0)
            & ((sh.filter_category & sh.filter_mask[s]) != 0))
        return (hit & sh.enable_sensor_events & ~same_body & filt
                & sh.enabled & b.enabled[sh.body]
                & sh.enable_sensor_events[s])

    overlap = jax.vmap(overlaps_for_sensor)(sid)  # (n_sensors, S)

    # keys = sensor_shape * S + visitor, compacted + sorted
    keys = jnp.where(overlap, sid[:, None] * S + jnp.arange(S)[None, :],
                     jnp.iinfo(jnp.int32).max).reshape(-1)
    kcap = cap.sensor_pair_capacity
    keys = jnp.sort(keys)
    if keys.shape[0] >= kcap:
        keys = keys[:kcap]  # capacity overflow drops the largest keys
    else:
        keys = jnp.concatenate([keys, jnp.full(
            kcap - keys.shape[0], jnp.iinfo(jnp.int32).max, jnp.int32)])

    old = state.sensor_overlap
    old_sorted = jnp.sort(jnp.where(old < 0, jnp.iinfo(jnp.int32).max, old))

    def in_set(queries, table):
        pos = jnp.clip(jnp.searchsorted(table, queries), 0, table.shape[0] - 1)
        return table[pos] == queries

    valid_new = keys != jnp.iinfo(jnp.int32).max
    valid_old = old_sorted != jnp.iinfo(jnp.int32).max
    begin_mask = valid_new & ~in_set(keys, old_sorted)
    end_mask = valid_old & ~in_set(old_sorted, keys)

    def compact(mask, keyarr):
        pairs = jnp.stack([keyarr // S, keyarr % S], axis=1)
        pos = jnp.cumsum(mask) - 1
        out = jnp.zeros((cap.event_capacity, 2), jnp.int32)
        out = out.at[jnp.where(mask, pos, cap.event_capacity)].set(
            pairs, mode="drop")
        return out, jnp.minimum(jnp.sum(mask),
                                cap.event_capacity).astype(jnp.int32)

    begin_arr, begin_count = compact(begin_mask, keys)
    end_arr, end_count = compact(end_mask, old_sorted)

    events = dataclasses.replace(
        state.events,
        sensor_begin=begin_arr, sensor_begin_count=begin_count,
        sensor_end=end_arr, sensor_end_count=end_count,
    )
    new_store = jnp.where(keys == jnp.iinfo(jnp.int32).max, -1, keys)
    return dataclasses.replace(state, events=events, sensor_overlap=new_store)
