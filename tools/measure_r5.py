"""Round-5 kernel-problem measurements on the real TPU (VERDICT #1).

Run each scenario in a FRESH process (STATUS gotchas: wedged queues,
per-process recompiles):  python tmp_measure_r5.py <scenario>

Scenarios:
  hf_compile   hailfinder-class posterior_batch B=128 f32: trace/compile/step
  uai          UAI-style 7x7 card-3 MRF B=10240: compile + steady step
  division     8x8 grid with distribute_division on: compile + step
  hf_unroll    hailfinder-class reduced-model batch program at unroll caps
"""
import sys
import time

import numpy as np


def _steady(fn, *args, iters=10):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return first, best


def hf_compile(B=128):
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import hailfinder_like

    factors, sizes, values = hailfinder_like()
    t0 = time.perf_counter()
    tree = jt.create_junction_tree(factors, sizes)
    print(f"plan build {time.perf_counter()-t0:.1f}s stats={tree.stats()}")
    eng = tree.engine().set_potentials(values)
    observed = list(sizes)[::3]
    evs = random_evidence_batch(tree.plan, B, observed, seed=3)
    masks = {k: jnp.asarray(v) for k, v in batch_masks_sparse(tree.plan, evs).items()}
    first, best = _steady(eng.posterior_batch, masks)
    print(f"hailfinder-class B={B}: first={first:.1f}s step={best*1e3:.3f}ms "
          f"qps={B/best:,.0f}")


def uai(B=10240):
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import grid_mrf_model

    factors, sizes, values = grid_mrf_model(7, 7, card=3, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    print("stats", tree.stats())
    eng = tree.engine().set_potentials(values)
    observed = list(sizes)[::4]
    evs = random_evidence_batch(tree.plan, B, observed, seed=11)
    masks = {k: jnp.asarray(v) for k, v in batch_masks_sparse(tree.plan, evs).items()}
    first, best = _steady(eng.posterior_batch, masks)
    print(f"uai 7x7 card3 B={B}: first={first:.1f}s step={best*1e3:.3f}ms "
          f"qps={B/best:,.0f}")


def division(B=4096):
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import grid_mrf_model

    which = sys.argv[2] if len(sys.argv) > 2 else "division"
    DEFAULT.distribute_division = which == "division"
    factors, sizes, values = grid_mrf_model(8, 8, seed=2)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    observed = list(sizes)[::2]
    evs = random_evidence_batch(tree.plan, B, observed, seed=7)
    masks = {k: jnp.asarray(v) for k, v in batch_masks_sparse(tree.plan, evs).items()}
    first, best = _steady(eng.posterior_batch, masks)
    print(f"8x8 {which} B={B}: first={first:.1f}s step={best*1e3:.3f}ms")


def hf_unroll():
    """The round-4 pathology reproducer: batch-aware program on the
    hailfinder-class model at several unroll caps, message form."""
    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.models import hailfinder_like

    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    DEFAULT.grouped_unroll_cap = cap
    factors, sizes, values = hailfinder_like()
    tree = jt.create_junction_tree(factors, sizes)
    print("stats", tree.stats())
    eng = tree.engine().set_potentials(values)
    B = 256
    v0 = list(sizes)[0]
    masks = {v0: jnp.zeros((B, sizes[v0]), jnp.float32) + 1.0}
    first, best = _steady(eng.posterior_batch, masks)
    print(f"hf cap={cap} B={B}: first={first:.1f}s step={best*1e3:.3f}ms")
    from junctiontree_tpu.utils.timing import TIMERS

    print("phases:", {k: round(v, 2) for k, v in TIMERS.report().items()})


def hf_split():
    """Split hailfinder-class posterior cold start into trace/lower vs XLA
    compile vs run."""
    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.executor import BatchedProgramBuilder
    from junctiontree_tpu.models import hailfinder_like

    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    DEFAULT.grouped_unroll_cap = cap
    factors, sizes, values = hailfinder_like()
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    B = 256
    names = list(sizes)
    observed = names[::3]
    import junctiontree_tpu.executor as ex

    ids = tuple(sorted(tree.plan.table.id_of(v) for v in observed))
    masks = [jnp.zeros((B, sizes[names[i]]), jnp.float32) + 1.0
             for i in range(0)]
    # build full per-id masks
    masks = [
        jnp.ones((B, tree.plan.sizes[v]), jnp.float32) for v in ids
    ]
    pots = eng._program_pots()
    builder = BatchedProgramBuilder(tree.plan, eng.semiring, list(ids),
                                    rescale=True)
    prog = builder.full()
    t0 = time.perf_counter()
    lowered = jax.jit(prog).lower(pots, masks)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_xla = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(pots, masks)
    jax.block_until_ready(out)
    t_run1 = time.perf_counter() - t0
    print(f"cap={cap}: lower={t_lower:.1f}s xla={t_xla:.1f}s "
          f"first_run={t_run1:.1f}s")
    cc = compiled.cost_analysis()
    if cc:
        print("flops", cc.get("flops"), "bytes",
              cc.get("bytes accessed"))


def hf_chunks():
    """Per-chunk XLA compile attribution: split the hailfinder-class
    program into N chunks and compile each SEQUENTIALLY, timing each."""
    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.executor import BatchedProgramBuilder
    from junctiontree_tpu.models import hailfinder_like

    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nseg = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    DEFAULT.grouped_unroll_cap = cap
    factors, sizes, values = hailfinder_like()
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    names = list(sizes)
    ids = tuple(sorted(tree.plan.table.id_of(v) for v in names[::3]))
    masks = [jnp.ones((B, tree.plan.sizes[v]), jnp.float32) for v in ids]
    pots = eng._program_pots()
    builder = BatchedProgramBuilder(tree.plan, eng.semiring, list(ids),
                                    rescale=True)
    seg_fns, carries = builder.segments(nseg)
    spec = lambda args: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        args,
    )
    pspec, mspec = spec(list(pots)), spec(list(masks))
    carry = ()
    tot = 0.0
    for i, fn in enumerate(seg_fns):
        cspec = spec(carry)
        t0 = time.perf_counter()
        lo = jax.jit(fn).lower(pspec, mspec, cspec)
        t_l = time.perf_counter() - t0
        t0 = time.perf_counter()
        lo.compile()
        t_c = time.perf_counter() - t0
        tot += t_c
        kinds = {}
        for s in builder._partition(nseg)[i]:
            kinds[s["kind"]] = kinds.get(s["kind"], 0) + 1
        print(f"chunk {i}: lower={t_l:.1f}s xla={t_c:.1f}s steps={kinds}",
              flush=True)
        carry = jax.eval_shape(fn, pspec, mspec, carry)
    print(f"total xla over {nseg} chunks: {tot:.1f}s")


def division7():
    """The round-3/4 division-path compile regression reproducer: 7x7
    card-3 grid, distribute_division on/off (config.py: 29s -> 176s)."""
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import grid_mrf_model

    which = sys.argv[2] if len(sys.argv) > 2 else "on"
    DEFAULT.distribute_division = which == "on"
    B = 2048
    factors, sizes, values = grid_mrf_model(7, 7, card=3, seed=5)
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    evs = random_evidence_batch(tree.plan, B, list(sizes)[::4], seed=11)
    masks = {k: jnp.asarray(v)
             for k, v in batch_masks_sparse(tree.plan, evs).items()}
    first, best = _steady(eng.posterior_batch, masks)
    print(f"7x7card3 division={which} B={B}: first={first:.1f}s "
          f"step={best*1e3:.3f}ms")


def hf_worststep():
    """Isolate the most expensive down step's contraction and time its
    compile under different formulations."""
    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.config import DEFAULT
    from junctiontree_tpu.executor import BATCH, routed_contract
    from junctiontree_tpu.models import hailfinder_like

    B = 64
    factors, sizes, values = hailfinder_like()
    tree = jt.create_junction_tree(factors, sizes)
    plan = tree.plan
    t = plan.tree
    # biggest clique
    def states(c):
        n = 1
        for v in plan.clique_vars[c]:
            n *= plan.sizes[v]
        return n

    big = max(range(t.num_cliques), key=states)
    print("big clique", big, "states", states(big), "vars",
          [(v, plan.sizes[v]) for v in plan.clique_vars[big]])
    print("parent sep" , plan.sep_vars[t.parent_sep[big]] if big != t.root else None)
    for k, s in t.children[big]:
        print("child", k, "sep", [(v, plan.sizes[v]) for v in plan.sep_vars[s]])
    # simulate the leave-one-out contraction to the first child's sep
    kids = t.children[big]
    if not kids:
        print("no kids"); return
    k0, s0 = kids[0]
    ops = [jnp.ones([states(big)], jnp.float32)]
    ovs = [list(plan.clique_vars[big])]
    # masks for vars homed here
    for v in range(plan.num_vars):
        if plan.var_to_clique[v] == big:
            ops.append(jnp.ones((B, plan.sizes[v]), jnp.float32))
            ovs.append([BATCH, v])
    # down message from parent sep (batched)
    if big != t.root:
        psep = plan.sep_vars[t.parent_sep[big]]
        n = 1
        for v in psep:
            n *= plan.sizes[v]
        ops.append(jnp.ones((B, n), jnp.float32))
        ovs.append([BATCH] + list(psep))
    # other children's up messages
    for k2, s2 in kids[1:]:
        sv = plan.sep_vars[s2]
        n = 1
        for v in sv:
            n *= plan.sizes[v]
        ops.append(jnp.ones((B, n), jnp.float32))
        ovs.append([BATCH] + list(sv))
    outv = list(plan.sep_vars[s0])
    print("n_ops", len(ops), "out states",
          int(np.prod([plan.sizes[v] for v in outv])))
    for cap in (int(sys.argv[2]) if len(sys.argv) > 2 else 64,):
        def f(*arrs):
            out, b = routed_contract(
                plan, jt.SUM_PRODUCT, list(arrs), ovs, outv,
                min_states=DEFAULT.pallas_min_states,
                grouped_min=DEFAULT.grouped_min_states, unroll_cap=cap)
            return out
        t0 = time.perf_counter()
        lo = jax.jit(f).lower(*ops)
        t_l = time.perf_counter() - t0
        t0 = time.perf_counter()
        co = lo.compile()
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = co(*ops); jax.block_until_ready(out)
        t_r = time.perf_counter() - t0
        print(f"cap={cap}: lower={t_l:.2f}s xla={t_c:.1f}s run={t_r*1e3:.1f}ms")


def hf_variants():
    """Alternative formulations of the worst hailfinder step, compile+run.

    vA: per-term run-rank slices, broadcast multiply at group rank,
        RESHAPE EACH TERM FLAT, accumulate flat.
    vB: broadcast-multiply-reduce at group rank (no dots), reduce then flat.
    """
    import itertools

    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.models import hailfinder_like

    B = 64
    factors, sizes, values = hailfinder_like()
    plan = jt.create_junction_tree(factors, sizes).plan
    t = plan.tree

    def states(c):
        n = 1
        for v in plan.clique_vars[c]:
            n *= plan.sizes[v]
        return n

    big = max(range(t.num_cliques), key=states)
    kids = t.children[big]
    k0, s0 = kids[0]
    ops, ovs = [], []
    ops.append(jnp.ones([states(big)], jnp.float32))
    ovs.append(list(plan.clique_vars[big]))
    batched = [False]
    for v in range(plan.num_vars):
        if plan.var_to_clique[v] == big:
            ops.append(jnp.ones((B, plan.sizes[v]), jnp.float32))
            ovs.append([v])
            batched.append(True)
    psep = plan.sep_vars[t.parent_sep[big]]
    npsep = int(np.prod([plan.sizes[v] for v in psep]))
    ops.append(jnp.ones((B, npsep), jnp.float32))
    ovs.append(list(psep))
    batched.append(True)
    for k2, s2 in kids[1:]:
        sv = plan.sep_vars[s2]
        n = int(np.prod([plan.sizes[v] for v in sv]))
        ops.append(jnp.ones((B, n), jnp.float32))
        ovs.append(list(sv))
        batched.append(True)
    outv = list(plan.sep_vars[s0])
    out_set = set(outv)
    member = {}
    for i, vs in enumerate(ovs):
        for v in vs:
            member.setdefault(v, set()).add(i)
    cvars = sorted(v for v in member if v not in out_set)
    sizes_ = plan.sizes
    # out groups by signature
    ogroups, okeys = [], []
    for v in sorted(member):
        if v not in out_set:
            continue
        k = frozenset(member[v])
        if ogroups and okeys[-1] == k:
            ogroups[-1].append(v)
        else:
            ogroups.append([v]); okeys.append(k)
    ogsizes = [int(np.prod([sizes_[v] for v in g])) for g in ogroups]
    O = int(np.prod(ogsizes))
    print("groups", len(ogroups), "O", O, "cvars",
          [(v, sizes_[v]) for v in cvars])

    def prep(i):
        vs = ovs[i]
        runs = []
        for v in vs:
            p = v in cvars and v not in out_set
            if runs and runs[-1][1] == p:
                runs[-1][0] *= sizes_[v]; runs[-1][2].append(v)
            else:
                runs.append([sizes_[v], p, [v]])
        lead = [B] if batched[i] else []
        xr = ops[i].reshape(lead + [r[0] for r in runs])
        mine = set(vs)
        gview = [B if batched[i] else 1] + [
            gs if g[0] in mine else 1 for g, gs in zip(ogroups, ogsizes)]
        return xr, runs, gview

    infos = [prep(i) for i in range(len(ops))]

    def term(i, assign):
        xr, runs, gview = infos[i]
        idx = [slice(None)] if batched[i] else []
        for sz, p, rv in runs:
            if p:
                j = 0
                for v in rv:
                    j = j * sizes_[v] + assign[v]
                idx.append(j)
            else:
                idx.append(slice(None))
        return xr[tuple(idx)].reshape(gview)

    def vA(*arrs):
        global ops
        acc = None
        for vals in itertools.product(*[range(sizes_[v]) for v in cvars]):
            assign = dict(zip(cvars, vals))
            p = None
            for i in range(len(arrs)):
                s = term(i, assign)
                p = s if p is None else p * s
            p = jnp.broadcast_to(p, [B] + ogsizes).reshape(B, O)
            acc = p if acc is None else acc + p
        return acc

    def vB(*arrs):
        p = None
        for i in range(len(arrs)):
            xr, runs, gview = infos[i]
            # full view incl contracted axes interleaved: use run view
            # broadcast at combined rank: contracted axes kept per operand
            pass
        # simple: multiply at full grouped rank incl contracted singleton
        # axes per var (rank = #ogroups + #cvars + 1)
        full_axes = []
        for v in sorted(member):
            full_axes.append(v)
        # build per-operand view over [B] + per-group/cvar axes
        dims = []
        for g in ogroups:
            dims.append(("g", tuple(g)))
        for v in cvars:
            dims.append(("c", (v,)))
        # operand reshape: its vars in sorted order must map to group/cvar
        # axes — only valid if each group all-or-none AND contracted vars
        # adjacency... do per-var axes instead (rank 1+13) — compile probe
        prod = None
        allv = sorted(member)
        for i in range(len(arrs)):
            vs = ovs[i]
            lead = [B] if batched[i] else [1]
            shape = lead + [sizes_[v] if v in vs else 1 for v in allv]
            x = arrs[i].reshape(
                ([B] if batched[i] else []) + [sizes_[v] for v in vs])
            # expand: put axes in allv order (vs is sorted subset)
            xx = arrs[i].reshape(shape)
            prod = xx if prod is None else prod * xx
        red = tuple(1 + j for j, v in enumerate(allv) if v not in out_set)
        out = jnp.sum(prod, axis=red)
        return out.reshape(B, O)

    def vC(*arrs):
        # group-rank accumulation (fused), one reshape at the end
        def term2(i, assign):
            xr0, runs, gview = infos[i]
            vs = ovs[i]
            lead = [B] if batched[i] else []
            xr = arrs[i].reshape(lead + [r[0] for r in runs])
            idx = [slice(None)] if batched[i] else []
            for sz, p, rv in runs:
                if p:
                    j = 0
                    for v in rv:
                        j = j * sizes_[v] + assign[v]
                    idx.append(j)
                else:
                    idx.append(slice(None))
            return xr[tuple(idx)].reshape(gview)

        acc = None
        for vals in itertools.product(*[range(sizes_[v]) for v in cvars]):
            assign = dict(zip(cvars, vals))
            p = None
            for i in range(len(arrs)):
                s = term2(i, assign)
                p = s if p is None else p * s
            acc = p if acc is None else acc + p
        acc = jnp.broadcast_to(acc, [B] + ogsizes)
        return acc.reshape(B, O)

    for name, fn in (("vC", vC), ("vA", vA), ("vB", vB)):
        try:
            t0 = time.perf_counter()
            lo = jax.jit(fn).lower(*ops)
            t_l = time.perf_counter() - t0
            t0 = time.perf_counter()
            co = lo.compile()
            t_c = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = co(*ops); jax.block_until_ready(out)
            t_r = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    out = co(*ops)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / 5)
            print(f"{name}: lower={t_l:.2f}s xla={t_c:.1f}s "
                  f"run={best*1e3:.2f}ms", flush=True)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}", flush=True)




def hf_mem():
    """VERDICT r4 #4: hailfinder-class f32 memory after the run-rank
    grouped-slicing change — XLA memory_analysis at B=128/256 plus a real
    B=256 f32 serve attempt (round 4: OOM at 15.8 GiB, ~40% layout-padding
    waste)."""
    import jax
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import hailfinder_like

    factors, sizes, values = hailfinder_like()
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    observed = list(sizes)[::3]
    for B in (128, 256):
        evs = random_evidence_batch(tree.plan, B, observed, seed=3)
        masks = {k: jnp.asarray(v)
                 for k, v in batch_masks_sparse(tree.plan, evs).items()}
        t0 = time.perf_counter()
        ma = eng.memory_analysis(masks)
        dt = time.perf_counter() - t0
        print(f"B={B} analysis ({dt:.0f}s): "
              + " ".join(f"{k}={v/(1<<30):.2f}G" for k, v in ma.items()
                         if k.endswith("bytes"))
              + f" fits={ma.get('fits')}")
    # real serve at B=256 f32
    evs = random_evidence_batch(tree.plan, 256, observed, seed=3)
    masks = {k: jnp.asarray(v)
             for k, v in batch_masks_sparse(tree.plan, evs).items()}
    try:
        first, best = _steady(eng.posterior_batch, masks)
        print(f"B=256 f32 SERVES: first={first:.1f}s step={best*1e3:.2f}ms "
              f"qps={256/best:,.0f}")
    except Exception as e:  # noqa: BLE001
        print(f"B=256 f32 FAILS: {type(e).__name__}: {str(e)[:300]}")


def hf_chunked():
    """Chunked serving: hailfinder-class f32 B=256 via chunk=128 (the
    B=256 monolith needs 18.4 of 15.75 GiB — measured OOM; the chunked
    path reuses the B=128 executable)."""
    import jax.numpy as jnp

    import junctiontree_tpu as jt
    from junctiontree_tpu.evidence import batch_masks_sparse, random_evidence_batch
    from junctiontree_tpu.models import hailfinder_like

    factors, sizes, values = hailfinder_like()
    tree = jt.create_junction_tree(factors, sizes)
    eng = tree.engine().set_potentials(values)
    observed = list(sizes)[::3]
    evs = random_evidence_batch(tree.plan, 256, observed, seed=3)
    masks = {k: jnp.asarray(v)
             for k, v in batch_masks_sparse(tree.plan, evs).items()}
    first, best = _steady(lambda m: eng.posterior_batch(m, chunk=128), masks)
    print(f"B=256 f32 chunk=128: first={first:.1f}s step={best*1e3:.2f}ms "
          f"qps={256/best:,.0f}")
    # and a padded partial chunk at B=300
    evs = random_evidence_batch(tree.plan, 300, observed, seed=4)
    masks = {k: jnp.asarray(v)
             for k, v in batch_masks_sparse(tree.plan, evs).items()}
    first, best = _steady(lambda m: eng.posterior_batch(m, chunk=128), masks)
    print(f"B=300 f32 chunk=128: step={best*1e3:.2f}ms qps={300/best:,.0f}")


if __name__ == "__main__":
    globals()[sys.argv[1]]()
