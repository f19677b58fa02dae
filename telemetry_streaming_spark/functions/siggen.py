"""Crash-signature generation (P26) — a self-contained implementation
of the fx-crash-sig / socorro "siggen" algorithm shape.

The reference pipes each crash payload through the external
``fx-crash-sig`` CLI (CrashPingStreamingBase.scala:236-278).  That
tool's algorithm is public and simple at its core:

1. take the crashing thread's frames from ``payload.stackTraces``;
2. name each frame: normalized C++ function if symbolicated, else
   ``module@module_offset``, else ``@ip``;
3. walk the names top-down — skip *irrelevant* frames (signal/abort
   trampolines, wait primitives), collect *prefix* frames (allocator
   and memcpy-style helpers that alone are not descriptive) and keep
   walking, then collect the first non-prefix frame and stop;
4. join the collected names with ``" | "``.

The rule lists below are a representative subset of Mozilla's
maintained lists — enough to produce faithful signatures for the
common shapes; production deployments pass their full, current lists
via :func:`make_signature_fn`.  Everything is pure Python operating on
one JSON string, designed to run inside the Arrow-batched pandas UDF
(jobs/crashes.py:crash_signature_udf) — no subprocess, no per-row
Python round trip through an external binary.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable

# Frames that never start (or appear in) a signature: OS/waiting/abort
# trampolines that say nothing about the crash cause.
DEFAULT_IRRELEVANT: tuple[str, ...] = (
    r"@0x[0-9a-fA-F]{2,}",
    r"RaiseException",
    r"KiFastSystemCallRet",
    r"KiUserCallbackDispatcher",
    r"(Nt|Zw)?WaitForSingleObject(Ex)?",
    r"(Nt|Zw)?WaitForMultipleObjects(Ex)?",
    r"RtlUserThreadStart",
    r"BaseThreadInitThunk",
    r"__libc_start_main",
    r"_start",
    r"raise",
    r"abort",
    r"sig_handler",
    r"signal_handler",
    r"WaitOnAddress",
)

# Frames that join the signature but do not end it: helpers whose
# caller is the interesting frame.
DEFAULT_PREFIX: tuple[str, ...] = (
    r"memcpy",
    r"memmove",
    r"__memmove_.*",
    r"memset",
    r"memcmp",
    r"strlen",
    r"strcmp",
    r"free",
    r"malloc",
    r"realloc",
    r"calloc",
    r"arena_.*",
    r"je_.*",
    r"moz_xmalloc",
    r"mozalloc_abort.*",
    r"mozalloc_handle_oom.*",
    r"NS_ABORT_OOM.*",
    r"MOZ_Crash.*",
    r"MOZ_CrashOOL.*",
    r"core::panicking::.*",
    r"std::panicking::.*",
    r"RustMozCrash",
    r"nsTSubstring<T>::.*",
    r"nsACString::.*",
    r"nsAString::.*",
    r"operator new.*",
    r"operator delete.*",
)

MAX_FRAMES = 40
EMPTY_SIGNATURE = "EMPTY: no crashing thread identified"
NO_FRAMES_SIGNATURE = "EMPTY: no frame data available"

_TEMPLATE_RE = re.compile(r"<[^<>]*>")
_LAMBDA_RE = re.compile(r"::lambda_[0-9a-f]+")
_ANON_NS_RE = re.compile(r"`anonymous namespace'|\(anonymous namespace\)")
_WS_RE = re.compile(r"\s+")
# trailing argument list only: innermost paren group at end-of-string,
# applied to fixpoint so nested arg lists strip without a greedy match
# eating "(anonymous namespace)" earlier in the name
_ARGS_RE = re.compile(r"\([^()]*\)(\s*const)?$")


def normalize_function(name: str) -> str:
    """C++ function name -> signature-eligible name: collapse template
    arguments to ``<T>``, drop the argument list, normalize anonymous
    namespaces and whitespace (the siggen C++ normalization rules)."""
    out = name
    # collapse nested template args inside-out until stable; a
    # non-bracket sentinel keeps the fixpoint moving (substituting
    # "<T>" directly would match itself and stall on nesting)
    prev = None
    while prev != out:
        prev = out
        out = _TEMPLATE_RE.sub("\x00", out)
    out = out.replace("\x00", "<T>")
    prev = None
    while prev != out:
        prev = out
        out = _ARGS_RE.sub("", out)
    out = _ANON_NS_RE.sub("(anonymous namespace)", out)
    out = _LAMBDA_RE.sub("::lambda", out)
    out = _WS_RE.sub(" ", out).strip()
    return out


def frame_name(frame: dict) -> str:
    """Best available name for one frame (function > module+offset >
    raw instruction pointer)."""
    fn = frame.get("function")
    if fn:
        return normalize_function(fn)
    module = frame.get("module")
    offset = frame.get("module_offset") or frame.get("offset")
    if module and offset is not None:
        return f"{module}@{offset}"
    ip = frame.get("ip")
    return f"@{ip}" if ip is not None else "@unknown"


def _compile(patterns: Iterable[str]) -> re.Pattern:
    return re.compile("^(?:" + "|".join(patterns) + ")$")


def generate_signature(
    stack_traces: dict,
    irrelevant: Iterable[str] = DEFAULT_IRRELEVANT,
    prefix: Iterable[str] = DEFAULT_PREFIX,
    max_frames: int = MAX_FRAMES,
) -> str:
    """Signature for one parsed ``payload.stackTraces`` object."""
    threads = stack_traces.get("threads") or []
    crash_info = stack_traces.get("crash_info") or {}
    idx = crash_info.get("crashing_thread")
    if idx is None or not (0 <= idx < len(threads)):
        return EMPTY_SIGNATURE
    frames = (threads[idx].get("frames") or [])[:max_frames]
    if not frames:
        return NO_FRAMES_SIGNATURE
    irre = _compile(irrelevant)
    pref = _compile(prefix)
    names = [frame_name(f) for f in frames]
    collected: list[str] = []
    seen_relevant = False
    for name in names:
        if not seen_relevant and irre.match(name):
            continue  # skip the irrelevant prelude
        seen_relevant = True
        collected.append(name)
        if not pref.match(name):
            break  # first non-prefix frame terminates the signature
    if not collected:
        return NO_FRAMES_SIGNATURE
    return " | ".join(collected)


def signature_from_json(stack_traces_json: str | None) -> str:
    """The per-payload call used by the pandas UDF: tolerant of null /
    malformed input (returns '' like the reference's error path,
    CrashPingStreamingBase.scala:263)."""
    if not stack_traces_json:
        return ""
    try:
        parsed = json.loads(stack_traces_json)
    except (ValueError, TypeError):
        return ""
    if not isinstance(parsed, dict):
        return ""
    try:
        return generate_signature(parsed)
    except Exception:
        return ""


def make_signature_fn(
    irrelevant: Iterable[str] = DEFAULT_IRRELEVANT,
    prefix: Iterable[str] = DEFAULT_PREFIX,
    max_frames: int = MAX_FRAMES,
):
    """Build a ``str -> str`` signature function with custom rule lists
    (e.g. Mozilla's full maintained lists) for crash_signature_udf."""

    def fn(stack_traces_json: str | None) -> str:
        if not stack_traces_json:
            return ""
        try:
            parsed = json.loads(stack_traces_json)
            if not isinstance(parsed, dict):
                return ""
            return generate_signature(parsed, irrelevant, prefix, max_frames)
        except Exception:
            return ""

    return fn
