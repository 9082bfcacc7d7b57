"""Generate a TF1-executed TRAINING-ROUND parity fixture.

Unlike the forward fixture (make_parity_fixture.py), this runs the
reference's OWN training machinery — ``create_student_v3`` from
``/root/reference/utils/graph_utils.py`` (imported as an oracle, executed
under tf.compat.v1) over the shipped student ``.meta`` — for several Adam
iterations and records the resulting parameter/loss/mask trajectories.
``tests/test_parity_round.py`` gates the JAX round
(``ams_tpu.distill.train_step``) against it, converting the round numerics
(TF1 Adam epsilon placement, slots-advance-under-mask, BN moving-average
updates with control deps, the coord-desc-auto percentile selection with its
strict ``>`` threshold and restore composition) from correct-by-derivation
into correct-by-fixture.

Comparison-horizon design: per-coordinate parameter gates are recorded at
a ONE-iteration horizon only (cold1 / full_it1 / fixed_it1 /
auto_postsel).  Measured on this network, cross-implementation f32
trajectories decorrelate per-coordinate within 3-4 Adam iterations (the
~0.8% of coordinates whose gradient sits at the float noise floor take
±lr sign-flipped steps, and batch-norm coupling amplifies those flips
~30x per iteration into the bulk — while TF-vs-TF re-runs stay bitwise
identical).  Multi-iteration fidelity is gated through the per-iteration
LOSS traces, the selection masks, and invariants that hold exactly at any
horizon (masked-out coordinates bitwise-frozen).

Three runs from identical initial state and identical batch sequences:
  cold1  — masked_gradients=False, ONE iteration of the reference ``train``
           op (graph_utils.py:495-496) from zero slots: the strict t=1 gate;
  auto   — ``coord_desc_auto``: frozen-params warmup (train_coord with an
           all-False mask — slots advance, params bitwise frozen), then
           restore_initial (BN moving stats back, Adam slots KEPT — the
           reference's per-round reset, run.py:309-310 + the filter at
           SemanticNetwork.py:154-156), then the selection probe step,
           |delta| percentile + where-revert restore
           (SemanticNetwork.py:263-288), then N-1 masked iterations.
           Selecting from warm slots matters: at Adam t=1 every live
           coordinate moves by ~lr so the percentile slices a degenerate
           cluster; from t=N+1 the |delta| ranking is well-separated and the
           TF-vs-JAX mask comparison is meaningful;
  full   — same warmup, then N iterations of train_coord(all-ones), which
           the tool asserts bitwise-equals the unmasked ``train`` op;
  fixed  — same warmup, then N iterations under a fixed
           Bernoulli(coord_frac) mask (the hardcoded-recipe / keep_mask
           path).

Environment notes (TF 2.21 compat.v1): ``tf.compat.v1.layers`` no longer
exists, so the ``_patch`` BN twin (graph_utils.py:368 — a disconnected
frozen-stats copy whose output the training path never consumes) is shimmed
with an equivalent variable layout; ``enable_v2_tensorshape`` is needed for
the reference's Dimension arithmetic; the drift-loss ``model.npy``
(graph_utils.py:437) is synthesized from the seeded graph init since the
mount ships no weight blobs.

Chaos-free variant (``--bn_pin``): the decorrelation amplifier above is BN
batch-stat coupling — a knife-edge sign flip in one coordinate perturbs the
batch moments every other coordinate normalizes by.  ``--bn_pin`` removes it
with .meta surgery: every FusedBatchNormV3 is flipped to
``is_training=False`` with its mean/variance inputs rewired from the empty
training-mode Consts to the ``moving_*/read`` nodes, and the ``update_ops``
collection is cleared so ``create_student_v3``'s BN control deps
(graph_utils.py:457,487,495) vanish and the moving statistics freeze.  With
normalization pinned and the warm-slot protocol, the masked-Adam machinery
is deterministic enough to gate per-coordinate parameter AND Adam-slot
trajectories over 10+ iterations (VERDICT r3 weak #1) — the JAX side runs
the same round with ``DistillSpec(bn_train=False)``.  The pinned fixture
additionally records final params, final Adam slots (m, v, beta powers) and
multi-horizon snapshots.  Its initial values carry moving statistics warmed
by a frozen-params run of the UNPINNED graph first — pinning the (0, 1)
init stats saturates ReLU6 across most of the network (measured: 64% of
coordinates exactly-zero gradient, selection cut 0.0) and would gate a
mostly-dead regime.

Functional full-round variant (``--functional``, requires ``--bn_pin``):
the per-coordinate story above tops out at ~12 iterations (bounded drift
grows ~6·lr by it12) but the reference round is 200 iterations
(run.py:32 ``iter`` default, consumed at run.py:312).  What matters after
a full round is not per-coordinate equality — it is the DEPLOYED MODEL.
This mode runs ONLY the reference's actual round protocol
(frozen-slot warmup → restore_initial → coord_desc_auto selection →
masked iterations) for the FULL reference iteration count and batch size,
and records what a functional gate needs: the selection mask (+margins),
the per-iteration loss trace, the final parameters, and the pinned
graph's argmax PREDICTIONS on a held-out frame set at both the initial
and the final parameters.  ``tests/test_parity_round_functional.py``
replays the identical protocol in JAX and gates deployed-prediction pixel
agreement, |ΔmIoU| under the reference convention, and selection-mask
agreement — the "trains the same model" gate, at the horizon where
per-coordinate gates are provably meaningless.

Usage:
    python tools/make_round_fixture.py --height 64 --out tests/fixtures/round_parity_h64.npz
    python tools/make_round_fixture.py --height 64 --iters 12 --bn_pin \
        --out tests/fixtures/round_parity_pinned_h64.npz
    python tools/make_round_fixture.py --height 64 --iters 200 --batch 10 \
        --bn_pin --functional --warm_iters 25 \
        --out tests/fixtures/round_functional_pinned_h64.npz
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import types

import numpy as np

REF = "/root/reference"
META_SRC = REF + "/checkpoints/deeplabv3_mobilenetv2_cityscapes/model.meta"

# Variables that are emulation plumbing, not model state (the reference's
# save_vars exclusion list, SemanticNetwork.py:146-147).
NON_MODEL = ("images", "labels", "label_cache", "image_cache", "global_step")


def _make_bn_shim(tf1):
    def bn_shim(input_tensor, fused=True, training=False, trainable=True,
                name=None):
        ch = int(input_tensor.shape[-1])
        with tf1.variable_scope(name):
            gamma = tf1.get_variable("gamma", [ch],
                                     initializer=tf1.ones_initializer(),
                                     trainable=trainable)
            beta = tf1.get_variable("beta", [ch],
                                    initializer=tf1.zeros_initializer(),
                                    trainable=trainable)
            mm = tf1.get_variable("moving_mean", [ch],
                                  initializer=tf1.zeros_initializer(),
                                  trainable=False)
            mv = tf1.get_variable("moving_variance", [ch],
                                  initializer=tf1.ones_initializer(),
                                  trainable=False)
        return tf1.nn.batch_normalization(input_tensor, mm, mv, beta, gamma,
                                          1e-3, name=name + "/out")
    return bn_shim


class _TFShim:
    """tf.compat.v1 proxy with .layers.batch_normalization restored."""

    def __init__(self, base):
        self._base = base
        self.layers = types.SimpleNamespace(
            batch_normalization=_make_bn_shim(base))

    def __getattr__(self, k):
        return getattr(self._base, k)


def load_reference_graph_utils(tf1):
    """Exec the reference's graph_utils with its tf bound to compat.v1."""
    ref_utils = types.ModuleType("ams.utils.utils")
    with open(f"{REF}/utils/utils.py") as f:
        exec(compile(f.read(), f"{REF}/utils/utils.py", "exec"),
             ref_utils.__dict__)
    ref_utils.tf = tf1

    ams_pkg = types.ModuleType("ams")
    ams_pkg.__path__ = []
    ams_utils_pkg = types.ModuleType("ams.utils")
    ams_utils_pkg.__path__ = []
    sys.modules.setdefault("ams", ams_pkg)
    sys.modules.setdefault("ams.utils", ams_utils_pkg)
    sys.modules["ams.utils.utils"] = ref_utils
    ams_utils_pkg.utils = ref_utils

    gu = types.ModuleType("ref_graph_utils")
    path = f"{REF}/utils/graph_utils.py"
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), gu.__dict__)
    gu.tf = _TFShim(tf1)  # all tf use is inside functions; rebind is enough
    return gu


def surger_bn_pin(meta_in: str, meta_out: str) -> int:
    """Rewrite a .meta with every FusedBatchNormV3 pinned to inference.

    - ``is_training`` -> False; stat inputs 3/4 rewired from the exported
      training graph's empty Consts to the sibling ``moving_mean/read`` /
      ``moving_variance/read`` nodes (verified present for all 54 BNs).
    - the ``update_ops`` collection (108 AssignMovingAvg ops) is cleared, so
      the train ops built later by create_student_v3 carry no BN control
      deps and the moving statistics stay bitwise-frozen.

    The AssignMovingAvg subgraphs still exist but are never fetched nor
    depended on — dead nodes.  Gradients are built AFTER import on the
    surgered graph, so tf.gradients emits the is_training=False
    FusedBatchNormGradV3 form.
    """
    from tensorflow.core.protobuf import meta_graph_pb2

    mg = meta_graph_pb2.MetaGraphDef()
    with open(meta_in, "rb") as f:
        mg.ParseFromString(f.read())
    n_bn = 0
    for node in mg.graph_def.node:
        if node.op != "FusedBatchNormV3":
            continue
        scope = node.name.rsplit("/", 1)[0]  # .../BatchNorm
        node.attr["is_training"].b = False
        node.input[3] = scope + "/moving_mean/read"
        node.input[4] = scope + "/moving_variance/read"
        n_bn += 1
    if n_bn == 0:
        raise RuntimeError("no FusedBatchNormV3 nodes found in %s" % meta_in)
    if "update_ops" not in mg.collection_def:
        raise RuntimeError("no update_ops collection to clear")
    del mg.collection_def["update_ops"]
    with open(meta_out, "wb") as f:
        f.write(mg.SerializeToString())
    return n_bn


def tracked_names(all_names):
    """Model variables the JAX params dict carries: everything except
    emulation plumbing, the _patch twins, the masked-gradient _copy backups
    and optimizer slots."""
    out = []
    for n in all_names:
        base = n[:-2] if n.endswith(":0") else n
        if base in NON_MODEL:
            continue
        if "_patch" in n or "_copy" in n or "Adam" in n or "power" in n:
            continue
        out.append(n)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--coord_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bn_pin", action="store_true",
                    help="chaos-free variant: pin every BN to its moving "
                         "statistics and freeze them (meta surgery); "
                         "records long-horizon param + Adam-slot snapshots")
    ap.add_argument("--functional", action="store_true",
                    help="full-round functional fixture: ONLY the auto "
                         "(coord_desc_auto) round at the full --iters, plus "
                         "held-out deployed predictions (requires --bn_pin)")
    ap.add_argument("--warm_iters", type=int, default=0,
                    help="frozen-slot warmup length (functional mode; "
                         "0 = same as --iters)")
    ap.add_argument("--holdout", type=int, default=8,
                    help="held-out frames for the deployed-prediction "
                         "record (functional mode)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.functional and not args.bn_pin:
        ap.error("--functional requires --bn_pin (unpinned BN chaos makes "
                 "even the functional comparison meaningless at 200 iters)")
    warm_iters = args.warm_iters or args.iters

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    import tensorflow.compat.v1 as tf1
    tf1.disable_v2_behavior()
    tf1.enable_v2_tensorshape()

    gu = load_reference_graph_utils(tf1)

    tmp = tempfile.mkdtemp(prefix="ams_round_fixture_")
    meta_file = os.path.join(tmp, "model.meta")
    if args.bn_pin:
        n_bn = surger_bn_pin(META_SRC, meta_file)
        print("bn_pin: pinned %d FusedBatchNormV3 nodes, update_ops cleared"
              % n_bn)
    else:
        shutil.copy(META_SRC, meta_file)
    meta_dir = os.path.join(tmp, "model")

    # ---- phase 1: seeded init of the bare meta -> canonical initial params
    g1 = tf1.Graph()
    with g1.as_default():
        tf1.set_random_seed(args.seed)
        tf1.train.import_meta_graph(meta_file, clear_devices=True)
        init1 = tf1.global_variables_initializer()
        gvars = tf1.global_variables()
    with tf1.Session(graph=g1) as s1:
        s1.run(init1)
        init_values = dict(zip([v.name for v in gvars], s1.run(gvars)))
    # the drift-loss checkpoint create_student_v3 np.load()s (keys keep ':0')
    np.save(meta_dir + ".npy", init_values)

    h, w = args.height, args.height * 2
    rng = np.random.RandomState(args.seed)
    pool_frames = rng.randint(0, 256, (args.pool, h, w, 3)).astype(np.uint8)
    pool_labels = rng.randint(0, 19, (args.pool, h, w)).astype(np.uint8)
    ignore = rng.rand(args.pool, h, w) < 0.05  # exercise the weights=0 path
    pool_labels[ignore] = 255
    idx_seq = rng.randint(0, args.pool, (warm_iters, args.batch))
    idx_seq2 = rng.randint(0, args.pool, (args.iters, args.batch))
    fixed_mask_rng = np.random.RandomState(args.seed + 1)
    if args.functional:
        # held-out set for the deployed-prediction gate: same distribution
        # as the training pool but never trained on (drawn from a separate
        # stream so pool/idx draws stay identical across modes)
        ho_rng = np.random.RandomState(args.seed + 2)
        holdout_frames = ho_rng.randint(
            0, 256, (args.holdout, h, w, 3)).astype(np.uint8)
        holdout_labels = ho_rng.randint(
            0, 19, (args.holdout, h, w)).astype(np.uint8)

    if args.bn_pin:
        # Moving-stat warmup (in the UNPINNED graph): at a seeded init the
        # moving stats are (0, 1) while real pre-activations have variance
        # ~1e4, so a pinned network saturates ReLU6 and ~64% of coordinates
        # get exactly-zero gradients (measured: the auto-selection
        # percentile cut collapses to 0.0 and the loss trace flatlines).
        # Run the reference's own train_coord under an all-False mask —
        # params bitwise-frozen, BN moving-average control deps advance —
        # for enough iterations that the frozen normalizers sit near the
        # real batch statistics (decay 0.9: 25 iters -> 93% converged),
        # then fold the warmed stats into the canonical initial values for
        # BOTH sides.  The pinned runs then exercise live gradients across
        # the whole network instead of a mostly-dead one.
        warm_meta = os.path.join(tmp, "model_warm")
        shutil.copy(META_SRC, warm_meta + ".meta")
        np.save(warm_meta + ".npy", init_values)
        stat_iters = 25
        stat_seq = rng.randint(0, args.pool, (stat_iters, args.batch))
        sw = gu.create_student_v3(warm_meta, class_weights=np.ones(19),
                                  masked_gradients=True)
        gw = sw["graph"]
        with gw.as_default():
            init_w = tf1.global_variables_initializer()
            initl_w = tf1.local_variables_initializer()
            assigns_w, pls_w = [], {}
            for v in tf1.global_variables():
                if v.name in init_values:
                    pl = tf1.placeholder(v.dtype, v.shape)
                    assigns_w.append(tf1.assign(v, pl))
                    pls_w[pl] = init_values[v.name]
            # only the canonical stats (create_student_v3 adds _patch twin
            # BNs whose stats are not part of the bare meta's variables)
            stat_names = [v.name for v in tf1.global_variables()
                          if "moving_" in v.name and v.name in init_values]
            stat_tensors = [gw.get_tensor_by_name(n) for n in stat_names]
        with tf1.Session(graph=gw) as sess_w:
            sess_w.run([init_w, initl_w])
            sess_w.run(assigns_w, pls_w)
            mask_pl_w = sw["grad_masks_pl"]
            zeros_w = {pl: np.zeros(init_values[k].shape, bool)
                       for k, pl in mask_pl_w.items()}
            for i in range(stat_iters):
                feed = {sw["learning_rate"]: args.lr}
                feed.update(zeros_w)
                sess_w.run(sw["fill_input_buffer"],
                           {sw["features_input"]:
                                pool_frames[stat_seq[i]].astype(np.float32),
                            sw["labels_input"]:
                                pool_labels[stat_seq[i]].astype(np.float32)})
                sess_w.run(sw["train_coord"], feed)
            warmed = dict(zip(stat_names, sess_w.run(stat_tensors)))
        changed = sum(1 for n in warmed
                      if not np.array_equal(warmed[n], init_values[n]))
        assert changed > 0, "stat warmup moved no moving statistics"
        init_values.update(warmed)
        np.save(meta_dir + ".npy", init_values)  # refresh drift checkpoint
        print("bn_pin: stat warmup folded %d/%d moving stats into the "
              "initial values (%d iterations)"
              % (changed, len(stat_names), stat_iters))

    track = tracked_names(init_values.keys())
    out = {
        "pool_frames": pool_frames, "pool_labels": pool_labels,
        "idx_seq": idx_seq.astype(np.int32),
        "idx_seq2": idx_seq2.astype(np.int32),
        "lr": np.float32(args.lr), "iters": np.int32(args.iters),
        "coord_frac": np.float32(args.coord_frac),
        "bn_pin": np.bool_(args.bn_pin),
        "functional": np.bool_(args.functional),
        "warm_iters": np.int32(warm_iters),
        "batch": np.int32(args.batch),
    }
    for n in track:
        out["init:" + n[:-2]] = init_values[n]

    def build(masked):
        student = gu.create_student_v3(
            meta_dir, class_weights=np.ones(19), masked_gradients=masked)
        g = student["graph"]
        with g.as_default():
            init = tf1.global_variables_initializer()
            initl = tf1.local_variables_initializer()
            assigns, pls = [], {}
            for v in tf1.global_variables():
                if v.name in init_values:
                    pl = tf1.placeholder(v.dtype, v.shape)
                    assigns.append(tf1.assign(v, pl))
                    pls[pl] = init_values[v.name]
            track_tensors = [g.get_tensor_by_name(n) for n in track]
            # Adam slots (m = <var>/Adam, v = <var>/Adam_1) + beta powers —
            # recorded for the pinned fixture's slot-trajectory gates
            slot_names = [v.name for v in tf1.global_variables()
                          if v.name.endswith(("/Adam:0", "/Adam_1:0"))
                          or "power" in v.name]
            slot_tensors = [g.get_tensor_by_name(n) for n in slot_names]
            # restore_initial: params + BN moving stats back to the
            # checkpoint, Adam slots/beta-powers untouched (run.py:309-310;
            # the filter skips only Adam/Momentum, SemanticNetwork.py:154)
            restore_ops, restore_pls = [], {}
            for var in tf1.global_variables():
                if var.name in track:
                    pl = tf1.placeholder(var.dtype, var.shape)
                    restore_ops.append(tf1.assign(var, pl))
                    restore_pls[pl] = init_values[var.name]
        sess = tf1.Session(graph=g)

        def reset():
            sess.run([init, initl])
            sess.run(assigns, pls)

        def restore_initial():
            sess.run(restore_ops, restore_pls)

        def snapshot():
            return dict(zip(track, sess.run(track_tensors)))

        def slot_snapshot():
            return dict(zip(slot_names, sess.run(slot_tensors)))

        def feed_batch(i, seq=idx_seq):
            fr = pool_frames[seq[i]].astype(np.float32)
            lb = pool_labels[seq[i]].astype(np.float32)
            sess.run(student["fill_input_buffer"],
                     {student["features_input"]: fr,
                      student["labels_input"]: lb})
        return (student, sess, reset, restore_initial, snapshot,
                slot_snapshot, feed_batch)

    # NOTE on the warm-slot protocol: every recorded multi-iteration run
    # does [frozen-params warmup on idx_seq] -> restore_initial ->
    # [recorded iterations on idx_seq2].  At Adam t=1 every coordinate's
    # update saturates at ±lr·sign(g), so coordinates with |g| at the
    # float-noise floor flip direction between any two implementations and
    # the trajectories diverge chaotically (measured: 0.8% knife-edge
    # coords after 1 cold iteration grow to 90%-of-coords disagreement by
    # iteration 4 — and a warmup that MOVES params transports that chaos
    # into the Adam slots, leaving 77% of first-recorded-iteration updates
    # off by >1e-4).  The warmup here is therefore train_coord with an
    # ALL-FALSE mask — the reference's own backup→Adam→revert-everything
    # op: params stay bitwise frozen, every warmup gradient is computed at
    # the identical initial point on both sides, and the slots agree to
    # float noise.  This is also a direct exercise of the
    # slots-advance-under-mask semantics.  The cold t=1 step is still
    # gated — by the dedicated 1-iteration "cold1" record below.

    if not args.functional:
        # ---- unmasked graph: cold 1-iter gate on the reference `train` op
        (student, sess, reset, restore_initial, snapshot, slot_snapshot,
         feed_batch) = build(masked=False)

        def run_full(i, seq=idx_seq):
            feed_batch(i, seq)
            return sess.run({"t": student["train"],
                             "loss": student["loss"]},
                            {student["learning_rate"]: args.lr})["loss"]

        reset()
        out["cold1_losses"] = np.asarray([run_full(0)], np.float32)
        for n, v in snapshot().items():
            out["cold1_final:" + n[:-2]] = v
        print("cold1 loss:", out["cold1_losses"])
        sess.close()

    # ---- masked graph: all recorded runs (train_coord(ones) ≡ train —
    # asserted bitwise below) ----
    (student, sess, reset, restore_initial, snapshot, slot_snapshot,
     feed_batch) = build(masked=True)
    mask_pl = student["grad_masks_pl"]        # keyed by entire_model_vars name
    emv = list(mask_pl.keys())
    ones = {k: np.ones(init_values[k].shape, bool) for k in emv}
    zeros = {k: np.zeros(init_values[k].shape, bool) for k in emv}

    def run_coord(masks, i, seq=idx_seq):
        feed = {student["learning_rate"]: args.lr}
        for k in emv:
            feed[mask_pl[k]] = masks[k]
        feed_batch(i, seq)
        return sess.run({"t": student["train_coord"],
                         "loss": student["loss"]}, feed)["loss"]

    with student["graph"].as_default():
        emv_vars = {var.name: var for var in tf1.global_variables()
                    if var.name in set(emv)}
        combine_ops, combine_input = {}, {}
        for k in emv:
            pl = tf1.placeholder(emv_vars[k].dtype, emv_vars[k].shape)
            combine_ops[k] = tf1.assign(emv_vars[k], pl)
            combine_input[k] = pl

    if not args.functional:
        # the masked graph's train_coord(all-ones) is numerically the
        # unmasked graph's train: assert the cross-check bitwise
        reset()
        cross = run_coord(ones, 0)
        assert cross == out["cold1_losses"][0], (cross, out["cold1_losses"])

    def warmup():
        """Frozen-params slot warmup + moving-stat reset; returns the
        loss trace (params never move, so it depends only on the batch
        sequence — a tight cross-implementation signal)."""
        reset()
        wl = [run_coord(zeros, i) for i in range(warm_iters)]
        # params are already bitwise-initial; this resets the BN moving
        # stats the warmup advanced.  Slots/beta-powers stay warm.
        restore_initial()
        return np.asarray(wl, np.float32)

    def predict(frames):
        """Deployed-model argmax on a frame stack (pinned graph: BN uses
        the frozen moving statistics — the inference semantics).  The
        input-buffer variables are emulation plumbing (NON_MODEL), so
        feeding them never perturbs the recorded trajectories."""
        preds = []
        for s in range(0, len(frames), args.batch):
            fr = frames[s:s + args.batch].astype(np.float32)
            lb = np.zeros(fr.shape[:3], np.float32)
            sess.run(student["fill_input_buffer"],
                     {student["features_input"]: fr,
                      student["labels_input"]: lb})
            preds.append(sess.run(student["predictions"]))
        return np.concatenate(preds).astype(np.int32)

    # ---- run "auto": warmup -> coord_desc_auto on idx_seq2 ----
    if args.functional:
        reset()
        out["pred_init"] = predict(holdout_frames)
        print("pred_init: %d held-out frames, class histogram %s"
              % (len(holdout_frames),
                 np.bincount(out["pred_init"].ravel(), minlength=19)[:8]),
              flush=True)
    out["warm_losses"] = warmup()
    print("warm (frozen-params) losses:", out["warm_losses"], flush=True)

    before = snapshot()
    losses = [run_coord(ones, 0, idx_seq2)]
    after = snapshot()
    changes = np.concatenate([np.abs(after[k] - before[k]).reshape(-1)
                              for k in emv])
    cut = np.percentile(changes, 100 * (1 - args.coord_frac))
    auto_mask = {k: np.abs(after[k] - before[k]) > cut for k in emv}
    sess.run([combine_ops[k] for k in emv],
             {combine_input[k]: np.where(auto_mask[k], after[k], before[k])
              for k in emv})
    frac = np.mean([m.mean() for m in auto_mask.values()])
    print("auto selection: cut=%.3e, mean per-var frac=%.3f" % (cut, frac))
    # post-selection state (probe step + where-revert restore): the
    # 1-iteration-horizon per-coordinate gate for the auto path
    for n, v in snapshot().items():
        out["auto_postsel:" + n[:-2]] = v
    for i in range(1, args.iters):
        losses.append(run_coord(auto_mask, i, idx_seq2))
        if args.functional and i % 20 == 0:
            print("auto iter %d/%d loss %.5f" % (i, args.iters, losses[-1]),
                  flush=True)
    if args.bn_pin:
        for n, v in snapshot().items():
            out["auto_final:" + n[:-2]] = v
    out["auto_losses"] = np.asarray(losses, np.float32)
    out["auto_cut"] = np.float64(cut)
    # |delta| margin to the cut — lets the test separate genuine mask
    # disagreements from float ties at the threshold
    for k in emv:
        out["auto_mask:" + k[:-2]] = auto_mask[k]
        out["auto_margin:" + k[:-2]] = (
            np.abs(after[k] - before[k]) - cut).astype(np.float32)
    print("auto losses:", losses)

    if args.functional:
        # deployed-model record: predictions of the trained (pinned)
        # graph on the held-out frames + the frozen-stat sanity check
        out["holdout_frames"] = holdout_frames
        out["holdout_labels"] = holdout_labels
        out["pred_final"] = predict(holdout_frames)
        flip = float((out["pred_final"] != out["pred_init"]).mean())
        print("pred_final: %.1f%% of held-out pixels changed class during "
              "the round" % (100 * flip), flush=True)
        snap = snapshot()
        for n in track:
            if "moving_" in n:
                assert np.array_equal(snap[n], init_values[n]), \
                    "pinned BN stat moved: " + n
        sess.close()
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        np.savez_compressed(args.out, **out)
        shutil.rmtree(tmp, ignore_errors=True)
        print("wrote %s (%.1f MB), %d tracked vars, %d entire_model_vars"
              % (args.out, os.path.getsize(args.out) / 1e6, len(track),
                 len(emv)))
        return

    # ---- run "full": warmup -> train_coord(ones) ≡ train on idx_seq2 ----
    wl = warmup()
    assert np.array_equal(wl, out["warm_losses"])  # TF determinism check
    losses = [run_coord(ones, 0, idx_seq2)]
    for n, v in snapshot().items():
        out["full_it1:" + n[:-2]] = v
    mid = args.iters // 2
    for i in range(1, args.iters):
        losses.append(run_coord(ones, i, idx_seq2))
        if args.bn_pin and i == mid - 1:
            for n, v in snapshot().items():
                out["full_it%d:" % mid + n[:-2]] = v
    out["full_losses"] = np.asarray(losses, np.float32)
    if args.bn_pin:
        snap = snapshot()
        for n, v in snap.items():
            out["full_final:" + n[:-2]] = v
        for n, v in slot_snapshot().items():
            out["full_slot:" + n[:-2]] = v
        # frozen-stat sanity: the pinned graph must not move ANY moving stat
        for n in track:
            if "moving_" in n:
                assert np.array_equal(snap[n], init_values[n]), \
                    "pinned BN stat moved: " + n
    print("full_model losses (warm):", losses)

    # ---- run "fixed": Bernoulli(coord_frac) mask from iteration 0,
    # warm-slot protocol like the others ----
    warmup()
    fixed_mask = {k: fixed_mask_rng.rand(*init_values[k].shape)
                  < args.coord_frac for k in emv}
    losses = [run_coord(fixed_mask, 0, idx_seq2)]
    for n, v in snapshot().items():
        out["fixed_it1:" + n[:-2]] = v
    losses += [run_coord(fixed_mask, i, idx_seq2)
               for i in range(1, args.iters)]
    if args.bn_pin:
        for n, v in snapshot().items():
            out["fixed_final:" + n[:-2]] = v
    out["fixed_losses"] = np.asarray(losses, np.float32)
    for k in emv:
        out["fixed_mask:" + k[:-2]] = fixed_mask[k]
    sess.close()
    print("fixed losses:", losses)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    shutil.rmtree(tmp, ignore_errors=True)
    print("wrote %s (%.1f MB), %d tracked vars, %d entire_model_vars"
          % (args.out, os.path.getsize(args.out) / 1e6, len(track), len(emv)))


if __name__ == "__main__":
    sys.exit(main())
