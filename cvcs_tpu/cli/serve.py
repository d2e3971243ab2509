"""``python -m cvcs_tpu.cli.serve <config.yaml>`` — directory-watching
segmentation service (beyond-reference: the reference's `inference.py` /
`esa.py` are one-shot scripts; production deployments segment rasters as
they arrive).

Watches ``watch_dir`` for new rasters (png/jpg/tif), segments each with
the whole-scene engine — same-shape arrivals batch into one jitted
program, and full groups run scene-parallel over a ``mesh`` (see
``common.segment_rasters``) — and writes ``<stem>_mask.png`` into
``output`` (same-stem sources with different suffixes get suffixed mask
names instead of overwriting). Processed names and per-raster latency are appended to
``output/manifest.jsonl`` (the service's observability surface and its
restart journal: already-listed names are never re-processed, so a
crashed or restarted service resumes where it left off; a torn final
line from a crash mid-append is skipped, and that raster simply runs
again — the export is idempotent).

A long-lived daemon must outlive bad input: sizes are probed from image
headers (a backlog never decodes into host RAM at once, and decoding is
bounded to ``max_batch`` rasters), a raster that fails to decode or
segment is retried on later polls and after ``max_retries`` attempts on
an UNCHANGED file (size+mtime — a file still being copied in resets the
counter, so slow arrivals are never blacklisted) is journaled with an
``error`` entry and skipped from then on, a batch failure falls back to
per-raster runs so one poison pill cannot block its group, and files
that vanish between listing and stat are skipped. ``settle_s > 0``
ignores files modified within the last N seconds (arrivals still being
copied in).

Config keys: ``watch_dir``, ``net``, ``patch_size`` (default 512 like
`esa.py:20-26`), ``load_checkpoint``, optional ``output`` (default
``<watch_dir>/output``), ``border_correction``, ``mesh``, ``poll_s``
(default 2.0), ``max_batch`` (default 8), ``max_retries`` (default 3),
``settle_s`` (default 0), ``max_polls`` (stop after N scans — the test
hook; the default runs until interrupted).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from cvcs_tpu import native
from cvcs_tpu.cli import common
from cvcs_tpu.infer import InferenceConfig, SceneSegmenter

RASTER_SUFFIXES = {".png", ".jpg", ".jpeg", ".tif", ".tiff"}
# formats the C++ tier decodes; jpegs always take the PIL path
NATIVE_SUFFIXES = {".png", ".tif", ".tiff"}


def _decode_rgb(f) -> np.ndarray:
    """Raster -> (H, W, 3) uint8 through the native tier (pulls the
    poll-time prefetch; decodes inline on a miss) with PIL fallback for
    jpeg / exotic sub-formats. Raises on genuinely bad input so the
    caller's retry/journal machinery engages."""
    arr = native.take(f) if f.suffix.lower() in NATIVE_SUFFIXES else None
    if arr is not None:
        if arr.ndim == 2:
            return np.repeat(arr[..., None], 3, axis=2)
        if arr.shape[2] >= 3:
            return np.ascontiguousarray(arr[..., :3])
        # 2-channel (LA etc.): let PIL's conversion rules decide
    from PIL import Image

    return np.asarray(Image.open(f).convert("RGB"))


# module-level alias so tools/serve_bench.py can wrap it for phase
# attribution
_fetch_labels = common.fetch_labels


def _read_journal(manifest) -> tuple[set, dict, dict]:
    """(names already handled, mask-filename claims, error signatures)
    from the journal.

    Error entries carry the failing file's (size, mtime_ns) signature so
    a raster REPLACED after its error was journaled (new signature) is
    re-admitted — without this, one bad copy would permanently blacklist
    the name even after the operator fixes the file.

    Also repairs a torn final line (crash mid-append): without a closing
    newline, the next append would concatenate onto the torn fragment
    and garble a GOOD entry too. The claims map (mask filename -> source
    raster name) lets a restarted daemon keep disambiguating same-stem
    sources (``a.png`` vs ``a.tif``) instead of overwriting masks.
    """
    done = set()
    claimed: dict[str, str] = {}
    error_sigs: dict[str, tuple | None] = {}
    if manifest.exists():
        data = manifest.read_bytes()
        if data and not data.endswith(b"\n"):
            with manifest.open("ab") as mf:
                mf.write(b"\n")
        for line in data.decode(errors="replace").splitlines():
            try:
                entry = json.loads(line)
                done.add(entry["name"])
                if "error" not in entry:
                    mask = entry.get(
                        "mask", f"{entry['name'].rsplit('.', 1)[0]}_mask.png")
                    claimed.setdefault(mask, entry["name"])
                    error_sigs.pop(entry["name"], None)
                else:
                    sig = entry.get("sig")
                    error_sigs[entry["name"]] = (
                        tuple(sig) if isinstance(sig, list) else None)
            except (json.JSONDecodeError, KeyError, TypeError):
                continue  # torn line: re-process that raster
    return done, claimed, error_sigs


def serve(config: dict) -> int:
    """Run the watch loop; returns the number of rasters processed."""
    from pathlib import Path

    from PIL import Image

    from cvcs_tpu.config.loader import SERVE_KEYS, validate_keys

    validate_keys(config, SERVE_KEYS, {"watch_dir", "net"}, "serve")
    Image.MAX_IMAGE_PIXELS = None
    watch = Path(config["watch_dir"])
    out_dir = Path(config.get("output", watch / "output"))
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = out_dir / "manifest.jsonl"
    done, claimed, error_sigs = _read_journal(manifest)

    p = int(config.get("patch_size", 512))
    (apply_fn, variables, num_classes,
     returns_logits, requires_context,
     stride_product) = common.build_apply(config, p)
    seg = SceneSegmenter(
        apply_fn, variables,
        InferenceConfig(
            patch_size=p,
            border_correction=config.get("border_correction"),
            # 128 is the measured window-path optimum (BASELINE.md bt
            # sweep); the engine clamps to the tile count, so small
            # arrivals never pad up to it
            batch_tiles=int(config.get("batch_tiles", 128)),
            num_classes=num_classes,
            tta=bool(config.get("tta"))),
        returns_logits=returns_logits,
        requires_context=requires_context,
        stride_product=stride_product)
    mesh = common.mesh_from_config(config)

    poll_s = float(config.get("poll_s", 2.0))
    settle_s = float(config.get("settle_s", 0.0))
    max_batch = max(1, int(config.get("max_batch", 8)))
    max_retries = max(1, int(config.get("max_retries", 3)))
    max_polls = config.get("max_polls")
    failures: dict[str, tuple[int, tuple]] = {}  # name -> (count, (size, mtime))
    n_processed = 0
    polls = 0

    def journal(entry: dict) -> None:
        with manifest.open("a") as mf:
            mf.write(json.dumps(entry) + "\n")
        done.add(entry["name"])

    def _sig(f):
        try:
            st = f.stat()
            return (st.st_size, st.st_mtime_ns)
        except OSError:
            return None

    def fail(f, err) -> None:
        # retries only count against an UNCHANGED file: a raster still
        # being copied in keeps failing to decode, but its (size, mtime)
        # keeps moving — resetting the counter prevents the daemon from
        # permanently blacklisting valid input mid-copy
        sig = _sig(f)
        prev_n, prev_sig = failures.get(f.name, (0, None))
        if sig is None:
            # file vanished mid-failure: journal the last KNOWN signature
            # so a later same-name replacement still re-admits (a sig-None
            # error entry would otherwise blacklist the name)
            sig = prev_sig
        n = prev_n + 1 if sig == prev_sig else 1
        failures[f.name] = (n, sig)
        if n >= max_retries:
            # record the failing signature: a REPLACED file (different
            # size/mtime) is re-admitted on a later poll / restart
            journal({"name": f.name, "error": str(err), "attempts": n,
                     "sig": list(sig) if sig else None})
            error_sigs[f.name] = sig
            failures.pop(f.name, None)
            print(f"giving up on {f.name} after {n} attempts: {err}",
                  flush=True)
        else:
            print(f"failed {f.name} (attempt {n}/{max_retries}, will "
                  f"retry): {err}", flush=True)

    def export(batch, labels, t0) -> None:
        nonlocal n_processed
        # ONE synced transfer for the whole batch: per-raster device_get
        # pays a tunnel/PCIe round-trip each (measured on the retrieve
        # CLI: batched sync was the largest of its three fixes), so cast
        # to uint8 on device and device_get the list at once —
        # copy_to_host_async overlaps the per-raster transfers
        labels = _fetch_labels(labels)
        # two passes: queue every mask on the native writer thread first
        # (palette decode + PNG encode overlap), flush ONCE, and only
        # then journal — a crash between queue and flush must not leave
        # journaled-done entries whose mask files never landed
        masks, queued = [], False
        for f, lab in zip(batch, labels):
            mask = f"{f.stem}_mask.png"
            if claimed.get(mask, f.name) != f.name:
                # same-stem sibling (a.png vs a.tif) already owns this
                # mask name — disambiguate instead of overwriting
                mask = f"{f.stem}{f.suffix.replace('.', '_')}_mask.png"
            claimed[mask] = f.name
            queued |= seg.export_map(lab, out_dir / mask,
                                     queue_native=True)
            masks.append(mask)
        if queued:
            n_failed = native.flush_writes()
            if n_failed:
                raise IOError(f"{n_failed} mask PNG writes failed under "
                              f"{out_dir}")
        for f, lab, mask in zip(batch, labels, masks):
            journal({"name": f.name, "mask": mask,
                     "shape": list(lab.shape), "batch": len(batch),
                     "batch_seconds": round(time.time() - t0, 3)})
            failures.pop(f.name, None)
            error_sigs.pop(f.name, None)
            n_processed += 1
            print(f"served {f.name} -> {mask}", flush=True)

    def _settled(f, now):
        # a file may vanish between iterdir() and stat() (producer tmp
        # files, operator cleanup) — skip it, never crash the daemon
        try:
            return now - f.stat().st_mtime >= settle_s
        except OSError:
            return False

    def _admissible(f) -> bool:
        if f.name not in done:
            return True
        if f.name not in error_sigs:   # success entry: never re-run
            return False
        old = error_sigs[f.name]
        cur = _sig(f)
        # an error entry whose sig is unknown (file vanished before the
        # give-up stat, or a legacy journal) re-admits as soon as the name
        # exists again — the present file cannot be proven identical to
        # the one that failed, and the retry budget bounds the cost
        if cur is not None and cur != old:
            # the journaled error was for a DIFFERENT file content —
            # the operator replaced it; re-admit with a fresh retry budget
            done.discard(f.name)
            error_sigs.pop(f.name, None)
            print(f"re-admitting replaced {f.name} "
                  "(signature differs from journaled error)", flush=True)
            return True
        return False

    while True:
        now = time.time()
        pending = sorted(
            f for f in watch.iterdir()
            if f.suffix.lower() in RASTER_SUFFIXES and _admissible(f)
            and _settled(f, now))
        # header-only size probe: group same-shape arrivals without
        # decoding the whole backlog into host RAM
        groups: dict[tuple, list] = {}
        for f in pending:
            try:
                with Image.open(f) as im:
                    groups.setdefault(im.size, []).append(f)
            except Exception as err:   # mid-copy / not an image
                fail(f, err)
        for files in groups.values():
            for i in range(0, len(files), max_batch):
                chunk = files[i:i + max_batch]
                # kick the C++ decoder thread for the whole chunk before
                # the first blocking take(): later files decode while
                # earlier ones upload/segment (SURVEY §3.1 I/O hot spot;
                # the tier exists for exactly this daemon's bottleneck)
                for f in chunk:
                    if f.suffix.lower() in NATIVE_SUFFIXES:
                        native.prefetch(f)
                batch, rasters = [], []
                for f in chunk:   # decode bounded to one batch
                    try:
                        rasters.append(_decode_rgb(f))
                        batch.append(f)
                    except Exception as err:
                        fail(f, err)
                if not batch:
                    continue
                t0 = time.time()
                try:
                    export(batch,
                           common.segment_rasters(seg, rasters, mesh), t0)
                except Exception as err:
                    if len(batch) == 1:
                        fail(batch[0], err)
                        continue
                    # isolate the poison pill: run each raster alone
                    for f, r in zip(batch, rasters):
                        if f.name in done:   # exported before the raise
                            continue
                        t1 = time.time()
                        try:
                            export([f],
                                   common.segment_rasters(seg, [r], mesh),
                                   t1)
                        except Exception as err2:
                            fail(f, err2)
        polls += 1
        if max_polls is not None and polls >= int(max_polls):
            return n_processed
        time.sleep(poll_s)


def main(argv=None) -> int:
    config = common.resolve_config_arg(argv or sys.argv)
    with common.device_context(config):
        n = serve(config)
    print(f"served {n} rasters", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
