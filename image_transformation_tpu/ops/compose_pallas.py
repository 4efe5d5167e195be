"""Fused Pallas resize+alpha-over compose kernel.

One grid program per canvas. The canvas stays in HBM (ANY memory space,
aliased input->output so updates are truly in place — XLA's
dynamic-update-slice copies the canvas per object, measured ~65us/step);
for each object the kernel:

1. DMAs the destination window (box-sized) HBM -> VMEM, overlapping the
   DMA with the resize matmuls;
2. premultiplies the RGBA cutout (Pillow MULDIV255, exact int math);
3. resamples with Pillow's int32 fixed-point tables via 3-limb bf16 MXU
   dots — bf16 holds the 8-bit limbs and pixels exactly and the MXU
   accumulates in f32, so the int32 arithmetic is reproduced exactly
   up to ~256 live taps per coefficient row (beyond that the f32 limb
   accumulators pass 2^24 — a >43x lanczos downscale; the ENGINE routes
   such placements to ops.compose's chunked-exact wide path, see
   resize.needs_wide_accumulation, and the traced-table kernels are
   inside their documented +-2/255 envelope regardless). The default
   s8 dot path (STATUS item 27) accumulates in s32, which has no
   mantissa bound — its worst-case exact range extends far past the
   f32 path's 2^24/43x line (the conservative engine routing is kept);
4. unpremultiplies (floor(255*c/a), alpha==0 passthrough) and applies the
   PIL identity-size shortcut;
5. alpha-blends (Pillow fixed-point, PRECISION_BITS=7) and DMAs the
   window back.

Geometry trick: the planar canvas is pre-padded by one window extent on
the bottom/right, so window origins never need clamping or compensating
source shifts (out-of-canvas pixels land in the cropped pad — PIL's
crop-to-canvas semantics). Objects with negative origins are dropped
(PIL raises there). z-order = object index order; the TPU grid is
sequential, preserving it.

Bit-exact vs the XLA exact path (and therefore vs PIL) with host-built
tables; traced-f32 tables carry the usual <=2/255 envelope.

STATUS (v5e). Three generations of kernels live here, all bit-exact and
interpret-tested in CI:
1. composite_batch_pallas (fully fused resize+blend, planar): correct on
   hardware but slow (~5 ms/object-step) and ~29 min to compile.
2. composite_batch_hybrid (XLA resize + planar-u8 blend kernel): the
   planar layout forced NHWC<->planar uint8 transposes in the wrapper
   (~300 ms/batch!) and fragmented DMAs.
3. composite_batch_hybrid_packed (XLA resize + PACKED-u32 blend): the RGBA
   quartet bitcasts to one u32 lane, so there are NO transposes, windows
   are single-plane contiguous, and channels unpack with shifts. This
   MATCHES OR BEATS the pure-XLA path at 1080p (14.1 vs 16 ms per batch of
   16) with bit-identical output. Two key discoveries, measured:
   - embedding the pallas_call in the producer jit made XLA schedule it
     ~25x slower; running producer and kernel as separate dispatches fixed
     it (~60 us extra launch cost);
   - the remaining ~10 ms/batch of kernel time is per-step overhead
     (serialized DMA latencies + rotate/switch relayouts), not bandwidth:
     shrinking band DMAs 5x changed little. Next: double-buffer DMAs
     across objects with an overlap-hazard check (ROADMAP).
A double-buffered variant (_pallas_blend_packed_pipelined: grid over
objects, fori over canvases so consecutive steps never alias) is correct
but measured NO faster (14.6 vs 14.1 ms) — per-step compute (zero-fill +
row-switch + lane-rotate + blend) dominates the DMA latency it hides, so
the simpler kernel stays default (pipelined=False).
A fourth variant (composite_batch_aligned) bakes the (dy, dx) window shift
into the resize coefficient tables so the kernel is pure DMA+blend — also
correct, but the producer's resize matmuls grow to the full window extent
(224x512 vs 208x384 tables) and the net is SLOWER (20.6 ms). To win it
needs dx folded into ws_x at finer DMA granularity or lane-rotate-free
windows; recorded for round 2.
Round-1 continuation (same chip, interleaved min-of-5 measurements,
benchmarks/bisect_resize.py --clamped):
5. CLAMPED windows (clamped=True, _pallas_blend_packed_clamped): window
   origins clamp to the canvas interior, so the producer pads the canvas
   to tile alignment only instead of a full window extent (~200 MB padded
   copy at 1080p gone) and the final crop is a bitcast; large dy handled
   by a %8 dynamic row load + static fine slice, large dx by the existing
   roll + a >=dx lane mask (the wrap columns are exactly PIL's cropped
   ones); the shift scratch zero-fills once per program. 8.33 -> 7.19
   ms/batch, bit-identical (blend geometry; since the traced resample
   moved to the HIGHEST-precision f32 dot, cross-PROGRAM comparisons of
   full composes are +-1 at rounding boundaries — the kernel tests pin
   geometry with the exact limb resample). THIS IS THE BENCH DEFAULT now.
6. ROW-BAKED (rowbaked=True, _pallas_blend_rowbaked): dy additionally
   folded into the V-pass tables so the kernel is DMA+roll+mask+blend
   with no shift scratch at all — correct but 8.04 ms: the producer's
   shifted resize (MH-row tables/sources + identity dynamic_slice) costs
   more than the kernel shift it removes. Kept for reference.
7. CLAMPED + double-buffered (clamped=True pipelined=True,
   _pallas_blend_clamped_pipelined): measured NET NEUTRAL again (7.22 vs
   7.21 ms min-of-5) — per-step compute (row load + roll + mask + blend,
   ~42 us/object-step at B=16) still dominates the DMA latency it hides.
8. Step anatomy (bisect_resize.py --anatomy): DMA-only 29 us/step, +shift
   +roll +blend adds only ~5 us — the kernel is DMA-issue/latency bound,
   which also explains why double-buffering is neutral (the scalar core
   serializes DMA issues).
9. BAND DMAs (band=True, _pallas_blend_band): full-width row bands are one
   contiguous descriptor vs 216 row segments, but 4x the bytes — measured
   SLOWER (6.62 vs 6.35 ms min-of-5 after the hp-resample + fused-u8-cast
   producer), so window slices are not descriptor-bound. Clamped stays
   default.
10. BATCHED-SRC (batchsrc=True) — one source DMA per canvas — measured
   NEUTRAL (6.38 vs 6.42); CANVAS-RESIDENT (resident=True) — whole packed
   canvas in VMEM, one round-trip per canvas, gated by
   _RESIDENT_VMEM_BUDGET_BYTES — measured SLOWER (6.60 vs 6.26): the
   full-canvas DMA bandwidth costs more than the per-window latency it
   saves. Five independent remedies (7-10) all neutral-or-worse puts the
   windowed blend at its practical floor (~34 us/object-step) for this
   geometry.
11. PROFILE-GUIDED epilogue (jax.profiler works over the tunnel —
   bench.py --profile + benchmarks/analyze_trace.py): the kernel itself
   is only ~0.3 ms/batch-of-16; the wall cost was copies AROUND it.
   Eager output bitcast (own program, cannot alias its live input),
   undonated canvas_v (defensive copy), and the on-device u8 NHWC
   materialization (3 full-canvas passes) — fixed by
   _pallas_blend_clamped_finish (crop+bitcast in-program, donated) and
   _pallas_blend_clamped_packed_out (packed u32 out; host bytes view as
   RGBA for free — packed_to_u8_np; verified bit-identical on hardware).
   With the reciprocal-multiply unpremultiply (s32 // was the largest
   producer fusion), headline went 2758 -> 3883 canvases/sec at batch 64.
   Re-tested single-program producer+pallas fusion: no longer the old
   25x pathology, but still slightly slower (3755) than two programs.
12. FUSED GEN-3 (composite_batch_fused_v3): coefficient tables built
   IN-KERNEL from per-object size scalars (meta grows to [B,N,10]) — the
   producer no longer materializes [B,N,out,in] kh/kv in HBM (~205 MB per
   64-canvas batch written + re-read via per-step DMAs) nor runs the
   VPU-bound Horner build as a separate serialized program; the in-step
   build hides under the window/object DMA latency. Plus an engine-style
   PACKED-u32 canvas input convention (host bytes view as u32 for free,
   skipping the on-device u8->u32 repack pass). Measured at batch 64,
   1080p, min-of-3x20: gen-2 10.65 ms -> gen-3 u8-in 9.74 ms -> gen-3
   packed-in 7.70 ms (6007 -> 8312 canvases/sec). Output within +-1 of
   gen-2 on hardware (the Mosaic f32 wsum reduction order differs from
   the XLA table builder's by <=1 quantized ulp); bit-equal to gen-2 in
   interpret mode. THIS IS THE BENCH + SWEEP DEFAULT now (tiered loud
   fallback: gen-3 -> gen-2 -> clamped -> XLA).
13. SINGLE-PROGRAM solid render (render_solid_fused_v3_program): profile
   showed device time 5.28 ms/batch vs 7.9 ms wall — ~2.6 ms of host
   dispatch gap across producer/kernel/stat programs, plus the 531 MB
   canvas pad copy (1.6 ms) in the producer. The on-device background
   fill writes the padded plane once at speed-of-light (0.87 ms) and the
   fill + fused kernel + fence stat compile into ONE dispatch: 8312 ->
   9388 (min-of-3x20; official bench 9476). The old embed-the-kernel
   pathology (item 3) was specific to the table-building producer.
   Engine variants measured NEUTRAL and kept documented: pre-planarized
   object assets (the transpose was already cheap), double-buffered
   window/object DMAs (still DMA-issue bound). Kernel floor is now
   compute: ~16.7 us/object-step (in-kernel table build ~5-7 us + limb
   dots ~7 us), with window DMAs fully hidden.
14. BIT-EXACT fused compose (composite_batch_fused_v2_host_tables /
   _fused_v2_exact_apply): the gen-2 kernel fed Pillow-exact HOST tables
   reproduces PIL bit-for-bit at fused-kernel speed — measured 2764
   canvases/sec at 1080p batch 16 with tables cached on device (5.8
   ms/batch, one dispatch) vs ~1365 for the batched exact XLA path.
   Caveats, measured: per-call table upload (~50 MB/batch-16) costs
   ~0.5 s over the tunnel (cache tables device-side — ComposeEngine's
   signature cache does), and Mosaic kernel compiles through the remote
   compile helper are WILDLY variable per new geometry (3 s to 8 min
   observed for the SAME program across runs, affecting gen-3 too — one
   probe measured v3 at 174 s and v2 at 3.3 s back-to-back; the
   persistent cache does not reliably cover them) — so ComposeEngine
   keeps the quick-compiling XLA indexed path as default and exposes
   this as kernel="pallas"/"auto" opt-in with a loud latched fallback.
15. IDENTITY-BRANCH fast path (gen-3, non-pipelined): `same` became a
   REAL pl.when branch — identity-size placements (out == in; the
   serving default-column-layout and agentic no-scaling workloads) skip
   the in-kernel table build AND the MXU resample, packing the raw
   object straight into the blend-source scratch. Measured on v5e
   (benchmarks/identity_bench.py, 1080p batch 64): all-identity batches
   6.76 -> 3.72 ms (9,473 -> 17,187 canvases/sec; 26.4 -> 14.5
   us/object-step, 1.82x); the scaled path is unchanged (6.82 vs 6.76
   ms, run-to-run noise). Numerics: all-identity batches are BIT-EXACT
   vs PIL on hardware (the branch has no resample); mixed/random
   geometries re-validated at the usual traced envelope (<= 2/255).
   The pipelined gen-3 variant keeps the select form (it is non-default
   and measured neutral).
16. ROW-BOUNDED BLEND (gen-3, non-pipelined): the shift+roll+mask+blend
   tail no longer processes the full (MH, MW) max-extent window — the
   object occupies only window rows [dy, dy+out_h) (rows outside carry
   zero source alpha: the in-kernel tables zero columns >= out_h and
   padded objects are zero beyond their box), so the blend walks only
   the _BLEND_CHUNK_ROWS-row chunks intersecting that band (dynamic
   fori_loop over full chunks + a static tail; skipped rows DMA back
   unchanged). Chunk sweep on v5e (1080p/64): C=64 scaled 6.36 ms,
   C=32 6.02-6.09, C=16 6.13 -> C=32 adopted. Cumulative with item 15:
   scaled 6.82 -> 6.09 ms, identity 3.72 -> 3.32 ms; HEADLINE (bench.py
   1080p batch 256) 11,725 -> 13,319 canvases/sec (+13.6%). Hardware
   numerics unchanged (exact 0; fused3 <= 2/255 across fixed + 12
   random geometries, validate_hw.py).
17. CHUNKED RESAMPLE (gen-3, non-pipelined): the H and V passes walk
   only the 128-wide output chunks the object actually produces
   (ceil(out_w/128) H chunks / ceil(out_h/128) V chunks) instead of the
   static batch-max extents — each chunk builds its 128-wide slice of
   the coeff table in-kernel (o_offset) and runs the 3-limb dots for
   that slice only, so table-build + MXU cost scales with the object's
   REAL output size. Unbuilt chunks leave garbage in the pk/tmp
   scratches; a masked src_shift write (row < out_h, col < out_w)
   zeroes it before the blend, which also hardens against stale rows
   from a previous larger object's pk. Measured on v5e (1080p/64):
   scaled 6.09 -> 4.78 ms (18.7 us/object-step); identity unchanged.
   HEADLINE (bench.py, batch 256): 13,319 -> 16,985 canvases/sec
   (cumulative items 15-17: 11,725 -> 16,985, +45%). Hardware numerics
   unchanged (per-chunk wsum reduces over the same elements as the full
   table's): exact 0, fused3 <= 2/255, validate_hw.py.
18. CHUNKED MASKED SOURCE WRITE — measured NEGATIVE and reverted
   (round-2 continuation): bounding the per-step masked pk -> src_shift
   copy to the C-row chunks the blend actually reads (same trick as
   items 16/17, with a leading-chunk skip for clamped bottom
   placements) measured SLOWER on v5e (1080p/64 interleaved A/B:
   scaled 4.98-5.27 vs 4.73-4.78 ms; identity neutral). The full
   (mh_a, mw_a) masked copy is a single well-pipelined VPU pass
   (~320 KB, well under 1 us); the dynamic fori_loop's per-iteration
   scalar overhead exceeds what it saves. Kernel floor levers left:
   bounding the resample dots' M-dim (input rows) to the object's real
   in_h — the limb dots still contract over all ph_a rows.
19. PER-OBJECT STATIC-SIZE BRANCHES (gen-3, round-2 continuation): the
   M/K bounding item 18 couldn't reach dynamically comes free when the
   caller knows the asset sizes STATICALLY — which every real workload
   does (assets are fixed per bundle; only boxes vary per render). With
   ``static_in_hw``, the kernel emits one pl.when(k == i) branch per
   object with prem/table/dots sized to round_up(h_i, 8) x
   round_up(w_i, 128) instead of the batch-max (ph_a, pw_a): ~-50% H-dot
   and ~-46% V-dot MACs on the squarespace mix, zero loop overhead, and
   bitwise-identical output (dropped rows/cols carry zero pixels or zero
   coefficients — sizes only need to be an UPPER BOUND, so multi-bundle
   sweeps pass the per-index max across bundles). Measured v5e 1080p
   batch 256: 16.54 -> 14.66 ms/batch interleaved A/B; headline 17.0k ->
   18.9k canvases/sec. Wired through bench, the sweep steps, fused
   serving steps, and the serving batch-step builder.
20. FRAMEBUFFER REUSE (round-2 continuation): the solid background fill
   was the last full-plane HBM pass (~3.0 ms for the 2.1 GB 1080p/256
   plane, memory speed-of-light — "irreducible" only if the plane is
   written fresh every dispatch). The fused kernels modify pixels ONLY
   inside their (MH, MW) windows, so a donated previous output returns
   to the all-solid state by restoring just those windows
   (_pallas_restore_windows: grid-(B,N) DMA of one solid VMEM block,
   ~0.45 GB => ~0.9 ms) — render_solid_fused_v3_reuse_program chains
   restore + fused render in one program on the donated plane. Measured
   v5e 1080p/256: 14.25 -> 12.10 ms/batch; with the superbatch scan
   carrying one live plane across steps AND dispatches, headline 18.9k
   -> 22.6k canvases/sec (23.4k pipelined). Bitwise-identical across
   multi-generation chains (test_fused_v3_framebuffer_reuse). bench.py
   threads the plane through its rep loop (first dispatch pays the one
   full fill); single-request serving keeps the fresh-fill program.
21. PIPELINED BACKPORT + LAGGED RESTORE (round-2 continuation): the
   double-buffered kernel variant received items 15-19 (identity branch,
   chunked resample, row-bounded blend, static-size branches — per-step
   compute under one static-slot switch), making its DMA schedule hide
   the ~1 us/step window writeback the grid-(B,N) kernel must expose;
   fresh-fill 14.8 -> 13.9 ms, reuse 12.5 -> 11.7 ms at 1080p/256
   (bitwise equal; now the bench/sweep default). The restore kernel's
   window DMAs are waited one step late on alternating semaphores
   (overlapping pairs write identical solid bytes, so races are benign):
   headline 24.3k -> 25.4k canvases/sec (10.1 ms/batch). Cumulative
   round-2 continuation: 16,985 -> 25,397 (+50%).
22. PER-OBJECT STATIC RESTORE WINDOWS: the restore kernel's DMAs shrink
   from the batch-max (MH, MW) window to each object's own extents
   (derived from static_obj_hw — a downscale-only render never touches
   more than the asset extent), ~53% of restore bytes on the
   squarespace mix. The grid flips to (object, batch) so consecutive
   steps share the DMA size, keeping the lagged-semaphore overlap valid
   (the first two canvases of each object row wait the previous
   object's size — a static branch). Extra contract: static sizes must
   upper-bound the rendered OUT sizes of prev_boxes (all solver paths
   are downscale-only). Measured v5e 1080p/256: headline 25.3k -> 26.1k
   canvases/sec (10.1 -> 9.8 ms/batch); bitwise-identical reuse chains
   re-verified on hardware and in interpret CI (incl. edge-clamped
   boxes).
23. SHARED STEP-COMPUTE BUILDERS: the per-step machinery the two gen-3
   kernels had duplicated (~130 lines each: identity pack, chunked
   resample, static-branch emission, masked write + row-bounded blend)
   now lives in four shared helpers (_identity_pack_into,
   _resample_chunked_into, _emit_resample_branches, _blend_window_rows)
   parameterized by slot accessors and DMA-wait thunks so each kernel
   keeps its exact DMA schedule. Proven a pure refactor: the jaxprs of
   render_solid_fused_v3_program and the reuse program are BITWISE
   IDENTICAL to the pre-refactor trace for all four variant combinations
   (pipelined x static_obj_hw), so Mosaic compiles the same program —
   no hardware re-measure needed. Future resample/blend fixes land once.
24. SHARED OBJECT TENSOR: every real single-bundle workload composites
   the SAME assets onto every canvas (bench headline: 448 copies of one
   ~8 MB object tensor = ~3.7 GB of duplicated HBM; the multi-ratio
   serving step: V copies per call), so the fused kernels now accept
   objs_p with a leading dim of 1 against a B-batch canvas and read
   object row 0 — bitwise-identical (interpret-pinned vs broadcast
   copies, both kernels + reuse chains). The pipelined kernel also drops
   (n_batch - 1) object DMAs per object row (one copy per grid step into
   slot 0) and halves its object VMEM scratch. bench.py uploads ONE
   planar copy on the primary path (the B-fold broadcast is now lazy,
   fallback-tier-only); the fused multi-ratio/serving step passes the
   single planar copy instead of broadcast_to. Hardware effect to be
   re-measured when the dev tunnel returns — the duplicated object
   tensor was a prime suspect for the batch-512 resource wall.
25. PREMULTIPLY HOIST + V-PASS COLUMN BOUNDING (2026-08-19): a round-3
   trace profile (benchmarks/analyze_trace.py) put the render kernel at
   95% of device time, 7.45 us/object-step at batch 768 — two per-step
   compute cuts inside _resample_chunked_into, both bit-identical by
   construction: (a) for shared objects the bf16 premultiplied
   channel-stack depends only on the object pixels, so the pipelined
   kernel computes it ONCE per grid step into a prem VMEM scratch
   (shared_fetch) instead of n_batch times — the per-step load is a
   plain VMEM slice read; (b) the V pass (dot + unpremultiply epilogue +
   packed write) used to run the full batch-max width per row chunk — it
   now walks only the ceil(out_w/128) column tiles the object actually
   produces (the same bound the H pass already had; mean tile work on
   the bench workload drops to 0.60x). Columns >= out_w keep whatever
   was in pk_ref — the blend's masked src_shift write zeroes them, the
   same contract never-built H chunks already relied on. Measured v5e
   1080p/768: 30,350/30,126 -> 33,526/33,629 canvases/sec (+11%);
   validate_hw.py unchanged (exact 0, fused3 <= 2/255); 42 interpret
   kernel parity tests green.
26. COMPONENT-SHARE EXPERIMENTS + SMALL CUTS (2026-08-19): stubbing one
   component at a time on hardware (benchmarks/component_shares.py)
   split the 23.1 ms batch-768 wall: coeff tables 6.4 ms (Horner eval
   only 1.6 — the iota/window/normalize scaffold is the rest), MXU limb
   dots ~6.3, packed alpha_over 2.3, unpremultiply epilogue 1.9,
   restore 1.1, remainder ~5 (DMAs, packs, src write, loop). Kept (each
   ~+1%, parity-green, no added state): (a) the o-only table chain
   (center/window bounds/tail mask) computes on an n_out vector and
   broadcasts (bitwise-identical f32); (b) shared_fetch writes the prem
   scratch PACKED per branch extents so the per-step load is one
   contiguous slice (no channel concat). Measured and REVERTED:
   (c) column-tiled blend (static pl.when tiles over [dx, dx+out_w)) —
   ~+1.5% on the small-object headline but -10% on the identity/
   no-scaling workload (full-cover blends paid 4 guarded part-ops per
   row chunk; identity_bench 64: 17,490 tiled vs 20,701 full-width);
   (d) fully unrolling the H/V chunk walks into pl.when-guarded
   straight-line code — 5x SLOWER (120 ms/batch; register/scheduling
   blowup), the dynamic fori_loops stay. Also rejected on lowering:
   dynamic value slices (Mosaic TC has no dynamic_slice primitive) and
   a scratch-staged dynamic blend fori (staging ate the win).
   Net 23.0 ms / 33,328-33,922 canvases/sec headline and 20,701
   identity (1080p/64). The remaining wall splits roughly evenly across
   table scaffold, dots, and blend/epilogue — each further cut bounded
   at ~1-4% (span-bounded tables/dots sized at ~3.6% for this
   workload's small objects and high geometry variance; not taken).
27. INT8 MXU LIMB DOTS (2026-08-19): a standalone Mosaic probe showed
   s8 x s8 -> s32 dot_general lowers on v5e at ~1.7x the bf16 dot rate,
   so the ROADMAP "u8 lhs doesn't fit s8 — needs a split" lever was
   built: _limb_dot_i8 re-centers both the byte limbs of the 23-bit
   fixed-point coefficients (mid/lo in [0,255] -> -128..127 s8) and the
   pixels (p-128), and restores the exact sums with integer correction
   terms (limb rowsums + a shared image colsum + a static 128^2.K
   constant; intermediates may wrap mod 2^32 — the combined value
   < 2^30 is exact, the same argument the bf16 (hi<<16)+(mid<<8)+lo
   combine relies on). The prem stack is re-centered once per object
   step and its colsum is shared across all H chunks; V tiles re-center
   per tile. Bit-exact: 120-case randomized unit parity (PIL-mass
   tables, both operand orders, vs bf16 AND an i64 oracle) + full
   fused-kernel interpret parity incl. identity-size and edge-hanging
   boxes (tests/test_compose_pallas.py); validate_hw envelope unchanged
   on the chip. Measured (interleaved A/B, batch 768 1080p): headline
   bf16 32,996/33,206 -> s8 34,091 canvases/sec (+2.7-3.3%); the
   dot-heavy scaled identity_bench leg 19,502 -> 20,488 (+5.1%);
   all-identity workload unchanged (34,126 vs 34,215 — that branch
   never resamples). DEFAULT ON (ITPU_INT8_DOTS=0 restores bf16).
28. CENTERED-S8 PREM SCRATCH (2026-08-19): the s8 re-centering of the
   premultiplied stack ran once per OBJECT-STEP inside the chunked
   resample; the pipelined kernel's shared-object scratch now stores
   the stack already centered as int8 (_premultiply2d(centered_s8=
   True), written once per grid step by shared_fetch) — the per-step
   prologue drops the [4ph, pw] sub/cast and the scratch load halves
   (bf16 -> s8 bytes). Mosaic lowers the s8 VMEM scratch fine at the
   8-multiple ph_k extents. Bitwise identical (the interpret flag-flip
   test pins the shared pipelined path s8-scratch == bf16-scratch;
   validate_hw envelope unchanged). Measured (batch 768 1080p):
   34,091/34,294/34,455/34,519 (item 27) -> **34,954/35,020**
   canvases/sec (+1.4%); identity_bench legs unchanged within noise
   (scaled 20,523, identity 34,370 — that bench's objects are not
   shared). Non-shared paths still re-center per step.
29. CENTERED-S8 H-PASS INTERMEDIATE (2026-08-20): on the s8 dot path
   the H pass stored its intermediate as bf16 and every V tile
   re-centered it per channel (_center_img_s8: 2 ops x [ph_k, 128] x 4
   channels x ch_w tiles). The H pass now stores
   (_clip8(ss) - 128).astype(int8) — one subtract per H chunk replacing
   the bf16 cast — and V tiles consume it directly; the tmp scratch
   halves (bf16 -> s8 bytes). Bitwise identical (_clip8 output in
   [0, 255] centers exactly; 47 interpret parity tests green). Compute
   model (ops/roofline_compute.py): VPU SOL 10.38 -> 10.21 ms/batch
   (v_tile 4.05 -> 3.83). Measured (interleaved A/B, batch 768 1080p,
   quiet host): base 35,566/35,576/35,653 -> item-29
   35,381/35,687/35,809/35,823 canvases/sec (~+0.5%, matching the
   model's ~+0.8% upper bound). Adopted: free, exact, less VMEM.
30. PER-OBJECT STATIC RENDER WINDOWS (2026-08-20, VERDICT r3 item 3):
   the pipelined kernel's window DMAs (plane -> VMEM and back) moved the
   batch-max (MH, MW) window every (object, batch) step regardless of
   the object's real size — 79% of the HBM roofline's modeled traffic,
   and the descriptor count scales with window ROWS, so batch-max
   windows also inflate the serialized DMA-issue work (the kernel's
   original bottleneck, item 8). With static_obj_hw available, each
   grid step's window copies are now sized to THAT object's extents
   (_static_window_extents — the item-22 restore treatment applied to
   the render window): _PerObjectCopy emits one pl.when(k == i) branch
   per object around the sized descriptor (exactly one runs; waits
   re-emit the size their start did), and _fused_v3_meta caps origins
   per object (hp - WH_k) so every window stays in-plane at its own
   size. Blend compute is untouched — it may still touch scratch beyond
   object k's window, but those rows never copy back and the masked
   source write keeps in-window overreach a no-op blend. Bitwise
   parity: tests/test_compose_pallas.py::test_static_windows_parity
   (downscale/identity/edge-clamp/off-canvas x fresh/reuse/producer
   surfaces, interpret). Measured (interleaved 3-trial A/B, quiet host,
   1080p batch 768, /tmp/ab_r4): batch-max 34,862/34,966/35,001 ->
   static 36,337/36,430/36,447 canvases/sec (+4.2%); identity bench at
   the headline kernel config: scaled leg 25,457/25,570 -> 26,251/26,339
   (+2.9%), identity leg 39,752/39,999 -> 41,709/41,914 (+4.5%) — both
   workloads improve, no item-26c-style regression. Modeled HBM traffic
   3.43 -> 2.13 GB/batch (window term 2.72 -> 1.42 GB). DEFAULT ON
   (ITPU_STATIC_WINDOWS=0 restores batch-max windows).
31. V-TABLE LIMB-SPLIT HOIST (2026-08-20): on the s8 path every
   (channel, column-tile) V dot re-split the SAME per-row-chunk table's
   byte limbs and re-reduced their rowsums inside _limb_dot_i8 (4 x
   ch_w times per v_chunk). _split_limbs_i8 now computes limbs +
   rowsums once per v_chunk and the dot calls consume them
   (bitwise-identical — same ops, same order, just not repeated).
   Compute model: VPU SOL 10.21 -> 9.09 ms/batch (v_tile 3.83 -> 2.55,
   v_table 0.55 -> 0.70). Measured (same A/B session, sw=0 arms):
   34,628/35,014 vs base 34,862/34,966/35,001 — NO wall effect; either
   Mosaic already hoisted the loop-invariant splits or the v_tile VPU
   stage is not serially binding (the sw=1 win landing in full argues
   the wall is DMA-side). KEPT: it makes the traced model honest about
   per-stage attribution and carries the fixup plumbing item 32 needs,
   at zero measured cost.
32. FOLDED LIMB-FIXUP VECTORS (2026-08-20, measured and REJECTED): fold
   the s8 dots' three rowsum corrections plus both scalar 128^2.K
   constants into ONE per-table row_fix vector ((rs_hi<<23) +
   (rs_mid<<15) + (rs_lo<<7) + 257*16384K, exact mod 2^32) and the
   colsum legs into one col_fix — bitwise identical by int32 wrap
   distribution, parity suite green on the experiment tree. Compute
   model: VPU SOL 9.09 -> 8.72 ms/batch (h_chunk 3.55 -> 3.39, v_tile
   2.55 -> 2.35). Measured (interleaved 3-arm A/B vs HEAD, quiet host,
   1080p batch 768, /tmp/ab_3arm + /tmp/ab_d32): base
   36,234/36,305/36,407/36,477/35,992 vs folded
   36,482/36,232/36,445 — wall-neutral within the run spread. NOT
   adopted: no measured win to pay for the churn; the shipped kernel
   stays the one the headline evidence was taken on.
33. FOLDED TABLE-CHAIN FACTOR (2026-08-20, measured and REJECTED —
   ROADMAP lever (b)): fold the coeff-table normalize / tail-mask /
   fixed-point scale into one per-o factor (the f32 divide runs on the
   n_out-lane reciprocal; two of three 2D multiplies drop), mirrored
   in resize.build_coeffs_traced so the v3==v2 interpret pin holds.
   Compute model: VPU SOL 9.09 -> 9.00 ms/batch. Measured (same 3-arm
   A/B): 36,462/36,125 vs base — wall-neutral, AND quantized entries
   can flip 1 ulp vs the unfolded order. Rejected: numerics churn for
   zero measured win.
   TOGETHER items 31-33 retire the VPU-op lever pool and ROADMAP lever
   (c) (software-pipelining tables against dots): three independent
   VPU-SOL cuts totalling ~1.7 ms of modeled compute moved the wall by
   NOTHING, while item 30's DMA-bytes cut (modeled 1.3 GB/batch) won
   +4.2% — so this session concluded the binding resource at 21
   ms/batch was DMA issue/bytes. ATTRIBUTION UPDATE (same day): the
   component-shares stub re-run on this kernel
   (benchmarks/component_shares.py, /tmp/shares_r04.log) measured the
   opposite at stage granularity — the stubbable stage shares SUM to
   ~20.9 of the 21.2 ms wall (tables 5.57, s8 dots+fixups >=4.51,
   blend ~5.2, epilogue ~2.0, exposed window DMAs only 1.66 ms), i.e.
   the kernel is a SERIALIZED stage chain with DMAs well overlapped.
   Both observations stand: removing a whole stage moves the wall by
   its share, but trimming op counts WITHIN a stage (items 31-33, and
   the modeled VPU SOL generally) does not — each stage's cost tracks
   its structure (issue/layout/dependency chains), not its lane-op
   count. Practical consequence: the remaining levers are structural
   (eliminate or overlap a STAGE, e.g. cross-step table prefetch into
   scratch), not arithmetic folds; the VPU-SOL model under-ranks
   structural cost and is kept for attribution only.
35. CROSS-CHUNK TABLE PREFETCH (2026-08-21, measured and REJECTED —
   VERDICT r4 item 3, the last lever with a modeled ceiling): software-
   pipeline the resample's per-chunk coeff-table builds one iteration
   ahead of their MXU dots (ITPU_PIPELINE_TABLES: both fori loops carry
   chunk c+1's table — the V pass carries the limb-split pair too — so
   each body's table scaffold has no data dependence on the dot it is
   scheduled next to and Mosaic may overlap them; clamped offset makes
   the final iteration's rebuild a dead carry). Bit-exact by
   construction, parity pinned across s8/bf16 x solid/batch surfaces
   (tests/test_compose_pallas.py::test_pipeline_tables_parity).
   Measured (single-process interleaved 3-round A/B at the headline
   config, 1080p batch 768, quiet host, healthy tunnel,
   benchmarks/ab_pipeline_tables.py -> benchmarks/
   ab_pipeline_tables_r05.json): scaled OFF 20.795/20.834/20.887
   ms/batch vs ON 22.203/22.253/22.712 — a 6.8% REGRESSION; identity
   10.31-10.48 vs 10.38-10.53, unchanged (the prefetch sits on the
   resample path identity skips). REJECTED, default OFF: the carried
   live table (+ limb pair) raises register/VMEM pressure across the
   loop back-edge and the clamped rebuild adds one redundant
   table-chunk per pass, while item 33's attribution already showed
   the stage chain does not reward in-stream reordering — the ~2-5 ms
   ceiling ROADMAP modeled for "genuine stage overlap" is not
   reachable by dependency-breaking alone. The flag and parity pin
   stay in-tree as the reproducible record. With items 26c/28/31/32/
   33/35 all measured-and-rejected and 27/29/30/34 adopted, the
   kernel's lever pool is EMPTY at stage granularity: every remaining
   structural change (true double-buffered cross-GRID-step prefetch
   would need the table stage hoisted into scratch DMAs Mosaic
   schedules asynchronously, which in-kernel computed tables cannot
   express) exceeds what the 21 ms wall can repay.
The XLA windowed path (ops.compose) remains the default for library calls;
bench.py embeds the single-program solid render (framebuffer-reuse mode
between dispatches, pipelined kernel).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize import PRECISION_BITS

_HALF = 1 << (PRECISION_BITS - 1)

# STATUS item 27: route the gen-3 chunked resample's exact limb dots
# through the MXU's s8 path (see _limb_dot_i8) instead of bf16 — DEFAULT
# ON after the measured hardware A/B (+2.7-3.3% headline, +5.1% on the
# dot-heavy scaled workload, identity unchanged, validate_hw envelope
# unchanged). ITPU_INT8_DOTS=0 restores the bf16 dots; tests flip the
# module attribute directly. Bit-exact either way (interpret parity
# pinned in tests/test_compose_pallas.py).
INT8_DOTS = os.environ.get("ITPU_INT8_DOTS", "1") == "1"

# STATUS item 30 (VERDICT r3 item 3): size the pipelined render kernel's
# per-step window DMAs to EACH object's static extents instead of the
# batch-max (MH, MW) — the item-22 treatment applied to the render
# window, which the HBM roofline flagged as 79% of modeled traffic.
# DEFAULT ON after the measured interleaved hardware A/B (+4.2%
# headline, +2.9% scaled / +4.5% identity cross-workload — STATUS item
# 30); ITPU_STATIC_WINDOWS=0 restores batch-max windows. Resolved by
# the fused-v3 programs when their ``static_windows`` argument is None.
# Like INT8_DOTS, jitted wrappers close over it — flip tests must
# jax.clear_caches().
STATIC_WINDOWS = os.environ.get("ITPU_STATIC_WINDOWS", "1") == "1"

# STATUS item 35 (VERDICT r4 item 3): software-pipeline the in-kernel
# coeff-table builds against the MXU limb dots — each resample chunk
# builds the NEXT chunk's table (straight-line, clamped offset; carried
# through the fori loop) before running its own dot, so the VPU table
# scaffold has no data dependence on the dot it is scheduled next to and
# Mosaic MAY co-issue them. Bit-exact by construction (same table
# values, same dot order). Costs one redundant table-chunk build per
# pass per object-step (the clamp rebuilds the last chunk's table).
# MEASURED AND REJECTED (2026-08-21): -6.8% on the scaled headline
# (20.83 -> 22.25 ms/batch, 3-round interleaved A/B), identity
# unchanged — DEFAULT OFF; see STATUS item 35 for the full record.
PIPELINE_TABLES = os.environ.get("ITPU_PIPELINE_TABLES", "0") == "1"


class _PerObjectCopy:
    """Start/wait shim for per-object-sized window DMAs (STATUS item 30).

    The double-buffered walk calls ``.start()``/``.wait()`` on whatever
    ``window_dma`` returns; with static per-object window extents the
    descriptor's SIZE depends on the grid's object index ``k``, so each
    call emits one ``pl.when(k == i)`` branch per object — exactly one
    runs (k is this grid step's scalar), and a wait always re-emits the
    same-sized descriptor its start did because both close over the same
    ``k``.
    """

    def __init__(self, k, sizes, make):
        self._k, self._sizes, self._make = k, sizes, make

    def _emit(self, op):
        for i, (wh, ww) in enumerate(self._sizes):
            @pl.when(self._k == i)
            def _(wh=int(wh), ww=int(ww)):
                op(self._make(wh, ww))

    def start(self):
        self._emit(lambda d: d.start())

    def wait(self):
        self._emit(lambda d: d.wait())


def _split_limbs_bf16(k_i32):
    hi = k_i32 >> 16
    rem = k_i32 - (hi << 16)
    mid = rem >> 8
    lo = rem - (mid << 8)
    to = lambda x: x.astype(jnp.bfloat16)  # exact: limbs in [-64, 255]
    return to(hi), to(mid), to(lo)


def _limb_dot(img_bf16, k_i32, contract_img: int, contract_k: int, k_first: bool):
    """Exact integer matmul via three bf16 MXU dots (f32 accumulation)."""
    hi, mid, lo = _split_limbs_bf16(k_i32)

    def dot(limb):
        if k_first:
            lhs, rhs = limb, img_bf16
            dims = (((contract_k,), (contract_img,)), ((), ()))
        else:
            lhs, rhs = img_bf16, limb
            dims = (((contract_img,), (contract_k,)), ((), ()))
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=dims, preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    return (dot(hi) << 16) + (dot(mid) << 8) + dot(lo)


def _center_img_s8(img_u8_range):
    """Image values in [0, 255] (any int/float dtype holding them
    exactly) -> re-centered p' = p - 128 as int8 (callers that need the
    colsum correction term reduce it themselves, see _limb_dot_i8)."""
    return (img_u8_range.astype(jnp.int32) - 128).astype(jnp.int8)


def _split_limbs_i8(k_i32, contract_k: int):
    """Pre-split a coefficient table for :func:`_limb_dot_i8`: the three
    re-centered s8 limbs plus ONE int32 rowsum of the original table
    over ``contract_k`` (STATUS item 31 — the V pass reuses ONE table
    across 4 channels x ch_w column tiles, so the limb split and the
    rowsum reduction hoist out of the per-(channel, tile) dot calls;
    STATUS item 34 — the three per-limb rowsums the fixup used to need
    collapse into this single table rowsum, see :func:`_limb_dot_i8`)."""
    hi = k_i32 >> 16
    rem = k_i32 - (hi << 16)
    mid = rem >> 8
    lo = rem - (mid << 8)
    hi8 = hi.astype(jnp.int8)
    mid8 = (mid - 128).astype(jnp.int8)
    lo8 = (lo - 128).astype(jnp.int8)
    rs_k = jnp.sum(k_i32, axis=contract_k)
    return hi8, mid8, lo8, rs_k


def _limb_dot_i8(img_i8, k_i32, contract_img: int, contract_k: int,
                 k_first: bool, img_colsum=None, k_limbs=None):
    """Exact integer matmul via three s8 MXU dots (s32 accumulation).

    Drop-in for :func:`_limb_dot` with the image side RE-CENTERED
    (p' = p - 128 as int8 via :func:`_center_img_s8`, p in [0, 255]).
    The MXU's s8 path measured ~1.7x the bf16 dot rate on v5e (Mosaic
    lowers s8 x s8 -> s32 dot_general), but neither the byte limbs of
    the 23-bit fixed-point coefficients (mid/lo in [0, 255]) nor the
    pixels fit s8 directly — so both are re-centered by 128 and exact
    integer identities restore the true sums. Per limb those are

        sum L.P  = sum L'.P' + 128.rowsum(L') + 128.colsum(P') + 128^2.K
        sum hi.P = sum hi.P' + 128.rowsum(hi)          (hi already s8)

    with K the static contraction length, rowsum contracting the limb,
    colsum contracting the image. Folding the three shifted corrections
    together (STATUS item 34), rowsum(hi)<<16 + rowsum(mid')<<8 +
    rowsum(lo') telescopes to rowsum(k) - 128.K.257 and the 128^2.K
    terms cancel it exactly, leaving

        T = (dot_hi<<16) + (dot_mid<<8) + dot_lo
            + 128.rowsum(k) + 257.128.colsum(P')

    — one i32 table reduction instead of three limb reductions, and two
    broadcast adds over the output grid instead of four adds + extra
    shifts. Every rearrangement is ring algebra mod 2^32 (shifts are
    multiplications), and the combined value is the true sum (< 2^30
    for normalized tables), so intermediate wraps stay harmless — the
    same argument the bf16 path's (hi<<16)+(mid<<8)+lo relies on — and
    results are bitwise identical to the unfolded form.

    ``img_colsum``: colsum(P') over ``contract_img`` — pass it to reuse
    across chunks sharing one image (the H pass). ``k_limbs`` (STATUS
    item 31): the table's pre-split limbs + rowsum from
    :func:`_split_limbs_i8` — callers that contract MANY images against
    ONE table (the V pass: 4 channels x ch_w tiles per row chunk)
    compute them once instead of per call.
    """
    if k_limbs is not None:
        hi8, mid8, lo8, rs_k = k_limbs
    else:
        hi8, mid8, lo8, rs_k = _split_limbs_i8(k_i32, contract_k)

    def dot(limb8):
        if k_first:
            lhs, rhs = limb8, img_i8
            dims = (((contract_k,), (contract_img,)), ((), ()))
        else:
            lhs, rhs = img_i8, limb8
            dims = (((contract_img,), (contract_k,)), ((), ()))
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=dims,
            preferred_element_type=jnp.int32,
        )

    if img_colsum is None:
        img_colsum = jnp.sum(img_i8.astype(jnp.int32), axis=contract_img)
    k_fix = rs_k << 7                                  # 128.rowsum(k)
    img_fix = (img_colsum << 7) + (img_colsum << 15)   # 257.128.colsum
    if k_first:  # out axes: (k_other, img_other)
        fix_a, fix_b = k_fix[:, None], img_fix[None, :]
    else:  # out axes: (img_other, k_other)
        fix_a, fix_b = img_fix[:, None], k_fix[None, :]
    return (
        (((dot(hi8) << 8) + dot(mid8)) << 8) + dot(lo8) + fix_a + fix_b
    )


def _clip8(ss):
    return jnp.clip(ss >> PRECISION_BITS, 0, 255)


def _exact_div_i32(num, den):
    """Exact floor(num/den) for 0 <= num < 2^31, 1 <= den, num/den < 2^16.

    Mosaic lowers int32 division to a software loop; an f32 reciprocal
    multiply gets within 1 ulp of the quotient (q <= 2^16 so the f32
    rounding error is < 0.02), and a single correction step makes it exact.
    """
    q = jnp.floor(
        num.astype(jnp.float32) * (1.0 / den.astype(jnp.float32))
    ).astype(jnp.int32)
    r = num - q * den
    q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _alpha_over_planar(dst_i32, src_i32):
    """Pillow-exact blend on planar [4, h, w] int32 stacks."""
    sa = src_i32[3]
    da = dst_i32[3]
    blend = da * (255 - sa)
    outa255 = sa * 255 + blend
    safe = jnp.where(outa255 == 0, 1, outa255)
    coef1 = _exact_div_i32(sa * (255 * 255 * 128), safe)
    coef2 = (255 * 128) - coef1
    tmp = src_i32[:3] * coef1[None] + dst_i32[:3] * coef2[None] + 0x80 * 128
    rgb = ((((tmp >> 8) + tmp) >> 8) >> 7)
    a_num = outa255 + 0x80
    out_a = ((a_num >> 8) + a_num) >> 8
    out = jnp.concatenate([rgb, out_a[None]], axis=0)
    return jnp.where((sa == 0)[None], dst_i32, out)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Chunk height for the gen-3 row-bounded blend loop (STATUS item 16).
# Multiple of 8 (sublane tiling); chunks beyond the object's occupied
# rows are skipped entirely, so smaller chunks bound the blend tighter
# at the cost of more loop iterations.
_BLEND_CHUNK_ROWS = 32


def window_extents(out_hw: Tuple[int, int]) -> Tuple[int, int]:
    """DMA window size: object extent + max origin remainder, tile-aligned.

    Window origins quantize to (8, 128) multiples (TPU DMA tiling), so the
    window must cover the object plus up to (7, 127) pixels of slack.
    """
    mh_out, mw_out = out_hw
    return _round_up(mh_out + 8, 8), _round_up(mw_out + 128, 128)


def _static_window_extents(
    static_obj_hw, out_max_hw: Tuple[int, int]
) -> Tuple[Tuple[int, int], ...]:
    """Per-object window extents from static asset sizes: each object's
    window covers ITS padded extents (capped at the batch-max envelope)
    plus the origin-quantization slack — a downscale-only render never
    touches more (STATUS items 22/30). Shared by the static restore
    kernel and the static-window render path so their DMA geometry (and
    the roofline model mirroring it) can never drift apart."""
    mh_a, mw_a = out_max_hw
    return tuple(
        window_extents((
            min(_round_up(max(int(h), 1), 8), mh_a),
            min(_round_up(max(int(w), 1), 128), mw_a),
        ))
        for h, w in static_obj_hw
    )


def _legacy_canvas_pad_hw(
    canvas_hw: Tuple[int, int], window_hw: Tuple[int, int]
) -> Tuple[int, int]:
    """Padded extents for the UNCLAMPED legacy kernels: the canvas pre-pads
    by a full window on the bottom/right so out-of-range window origins
    never need in-kernel clamping (cropped back by the wrapper)."""
    h_c, w_c = canvas_hw
    MH, MW = window_hw
    return _round_up(h_c + MH, 8), _round_up(w_c + MW, 128)


def _window_meta6(boxes, canvas_hw, origin_cap=None, same=None):
    """Shared drop/clamp/window-origin derivation for every producer tier.

    Returns the [B, N, 6] i32 meta = (ws_x, ws_y, dx, dy, same, valid)
    consumed by the blend kernels: window origins quantize down to the
    (8, 128) DMA tiles, (dx, dy) is the object's in-window offset, and
    placements whose top-left corner falls outside the canvas are dropped
    (the reference paints nothing for them either — its paste origin is
    the clamped box corner, compositor.py:16-21).

    ``origin_cap``: (max_ws_y, max_ws_x) for the CLAMPED kernels, whose
    window origins must stay inside the tile-aligned padded canvas; None
    selects the unclamped legacy convention (canvas pre-padded by a full
    window, see _legacy_canvas_pad_hw). ``same``: optional [B, N] bool
    identity-size flags (kernels with an identity fast path); zeros when
    absent.

    SMEM layout note: every pallas_call site transposes the table to
    scalar-major ``(S, N, B)`` before prefetch and kernels read
    ``meta_ref[scalar, k, b]``. Mosaic pads the LAST smem dim to 128
    lanes, so the batch-major ``[B, N, S]`` layout cost B*N*128*4 bytes
    of the 1 MiB smem — the measured batch-512 compile wall
    (B*N = 2048 -> exactly 1.00 MiB + spills, RESOURCE_EXHAUSTED).
    Scalar-major puts the large batch dim last: dense, ~21x headroom.
    """
    h_c, w_c = canvas_hw
    x1 = boxes[..., 0]
    y1 = boxes[..., 1]
    drop = (x1 < 0) | (y1 < 0) | (x1 >= w_c) | (y1 >= h_c)
    x1c = jnp.clip(x1, 0, w_c)
    y1c = jnp.clip(y1, 0, h_c)
    ws_x = (x1c // 128) * 128
    ws_y = (y1c // 8) * 8
    if origin_cap is not None:
        ws_y = jnp.minimum(ws_y, origin_cap[0])
        ws_x = jnp.minimum(ws_x, origin_cap[1])
    same_col = jnp.zeros_like(x1) if same is None else same.astype(jnp.int32)
    return jnp.stack(
        [ws_x, ws_y, x1c - ws_x, y1c - ws_y, same_col,
         (~drop).astype(x1.dtype)],
        axis=-1,
    ).astype(jnp.int32)


def _make_kernel(n_obj: int, out_hw: Tuple[int, int]):
    mh_out, mw_out = out_hw
    MH, MW = window_extents(out_hw)

    def kernel(meta_ref, canvas_ref, objs_ref, kh_ref, kv_ref, out_ref,
               win_ref, src_ref, obj_vmem, kh_vmem, kv_vmem,
               sem_in, sem_out, sem_obj, sem_kh, sem_kv):
        del canvas_ref  # aliased to out_ref; all access goes through out_ref
        b = pl.program_id(0)

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _():
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]
                same = meta_ref[4, k, b] > 0

                # Objects/tables live in HBM (VMEM cannot hold N pipelined
                # copies); DMA just this object's slices.
                d_obj = pltpu.make_async_copy(objs_ref.at[b, k], obj_vmem, sem_obj)
                d_kh = pltpu.make_async_copy(kh_ref.at[b, k], kh_vmem, sem_kh)
                d_kv = pltpu.make_async_copy(kv_ref.at[b, k], kv_vmem, sem_kv)
                d_obj.start()
                d_kh.start()
                d_kv.start()

                window_slice = out_ref.at[
                    b, :, pl.ds(ws_y, MH), pl.ds(ws_x, MW)
                ]
                dma_in = pltpu.make_async_copy(window_slice, win_ref, sem_in)
                dma_in.start()

                d_obj.wait()
                d_kh.wait()
                d_kv.wait()

                # --- resize while the window DMA is in flight ---
                obj = obj_vmem[...].astype(jnp.int32)  # [4, mh, mw]
                alpha = obj[3]
                tmp_p = obj[:3] * alpha[None] + 128
                prem_rgb = ((tmp_p >> 8) + tmp_p) >> 8
                prem = jnp.concatenate([prem_rgb, alpha[None]], axis=0)

                kh = kh_vmem[...]  # [mw_out, mw_in]
                kv = kv_vmem[...]  # [mh_in, mh_out] (transposed)

                # H-pass with channels stacked into M: one dot per limb.
                mh_in = obj.shape[1]
                prem2d = prem.reshape(4 * mh_in, obj.shape[2]).astype(jnp.bfloat16)
                ss = _limb_dot(prem2d, kh, 1, 1, k_first=False) + _HALF
                tmp = _clip8(ss).reshape(4, mh_in, mw_out).astype(jnp.bfloat16)

                chans = []
                for c in range(4):
                    # kv is transposed (lane = mh_out, the DMA-aligned dim);
                    # contract both operands on dim 0.
                    ss = _limb_dot(tmp[c], kv, 0, 0, k_first=True) + _HALF
                    chans.append(_clip8(ss))
                resized_p = jnp.stack(chans, axis=0)  # premultiplied int32

                ra = resized_p[3]
                rgb = jnp.minimum(
                    255,
                    _exact_div_i32(255 * resized_p[:3], jnp.maximum(ra, 1)[None]),
                )
                rgb = jnp.where((ra == 0)[None], resized_p[:3], rgb)
                resized = jnp.concatenate([rgb, ra[None]], axis=0)

                # PIL identity shortcut: same size => plain copy of the object.
                ch = min(obj.shape[1], mh_out)
                cw = min(obj.shape[2], mw_out)
                ident = jnp.pad(
                    obj[:, :ch, :cw],
                    ((0, 0), (0, mh_out - ch), (0, mw_out - cw)),
                )
                resized = jnp.where(same, ident, resized)

                # Place the source at (dy, dx) inside the aligned window:
                # 8-way static row shift (sublane loads need static starts),
                # then a dynamic lane rotate (wrap brings zeros: the buffer
                # keeps >= 128 zero lanes past the object).
                src_ref[...] = jnp.zeros(src_ref.shape, src_ref.dtype)
                src_ref[:, 8 : 8 + mh_out, :mw_out] = resized.astype(jnp.uint8)
                rows = jax.lax.switch(
                    dy,
                    [
                        (lambda d: lambda: src_ref[:, 8 - d : 8 - d + MH, :])(d)
                        for d in range(8)
                    ],
                )
                # roll requires 32-bit data; widen after the row slice.
                src = pltpu.roll(rows.astype(jnp.int32), dx, axis=2)

                dma_in.wait()
                dst = win_ref[...].astype(jnp.int32)
                win_ref[...] = _alpha_over_planar(dst, src).astype(jnp.uint8)
                dma_out = pltpu.make_async_copy(win_ref, window_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_compose_planar(
    canvas_p: jnp.ndarray,  # [B, 4, Hp, Wp] u8 (pre-padded by one window)
    objs_p: jnp.ndarray,  # [B, N, 4, mh, mw] u8 (tile-aligned mh, mw)
    kh: jnp.ndarray,  # [B, N, mw_out, mw] i32
    kv_t: jnp.ndarray,  # [B, N, mh, mh_out] i32 (TRANSPOSED: lane = mh_out)
    meta: jnp.ndarray,  # [B, N, 6] i32 = (ws_x, ws_y, dx, dy, same, valid)
    interpret: bool = False,
) -> jnp.ndarray:
    B = canvas_p.shape[0]
    N = objs_p.shape[1]
    mh_out = kv_t.shape[3]
    mw_out = kh.shape[2]
    MH, MW = window_extents((mh_out, mw_out))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # canvas stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # objects: DMA'd per use
            pl.BlockSpec(memory_space=pl.ANY),  # kh tables
            pl.BlockSpec(memory_space=pl.ANY),  # kv tables
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, MH, MW), jnp.uint8),
            pltpu.VMEM((4, MH + 8, MW), jnp.uint8),
            pltpu.VMEM((4, objs_p.shape[3], objs_p.shape[4]), jnp.uint8),
            pltpu.VMEM((mw_out, kh.shape[3]), jnp.int32),
            pltpu.VMEM((kv_t.shape[2], mh_out), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(N, (mh_out, mw_out)),
        out_shape=jax.ShapeDtypeStruct(canvas_p.shape, jnp.uint8),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},  # canvas (first tensor input) -> output
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_p, objs_p, kh, kv_t)


def composite_batch_pallas(
    canvases: jnp.ndarray,  # [B, H, W, 4] u8
    objs: jnp.ndarray,  # [B, N, mh, mw, 4] u8
    obj_hw: jnp.ndarray,  # [B, N, 2] (h, w)
    boxes: jnp.ndarray,  # [B, N, 4]
    kh: jnp.ndarray,  # [B, N, mw_out, mw] i32
    kv: jnp.ndarray,  # [B, N, mh_out, mh] i32
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused compose over a batch. Tables may be host-exact or traced-f32.

    Transposes to the planar kernel layout and pre-pads the canvas by one
    window extent (cropped after) so no in-kernel clamping is needed.
    """
    h_c, w_c = canvases.shape[1], canvases.shape[2]
    ph, pw = objs.shape[2], objs.shape[3]
    mh_out = kv.shape[2]
    mw_out = kh.shape[2]

    # DMA slice shapes must be tile-aligned: pad object rows to %8, object
    # cols (kh lanes) to %128, kh rows to %8; kv transposes so its lane dim
    # (mh_out) pads to %128 and its sublane (mh_in) to %8.
    ph_a = _round_up(ph, 8)
    pw_a = _round_up(pw, 128)
    mh_out_a = _round_up(mh_out, 128)
    mw_out_a = _round_up(mw_out, 8)
    objs = jnp.pad(objs, ((0, 0), (0, 0), (0, ph_a - ph), (0, pw_a - pw), (0, 0)))
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, mw_out_a - mw_out), (0, pw_a - pw)))
    kv = jnp.pad(kv, ((0, 0), (0, 0), (0, mh_out_a - mh_out), (0, ph_a - ph)))
    kv_t = jnp.transpose(kv, (0, 1, 3, 2))
    mh_out, mw_out = mh_out_a, mw_out_a
    MH, MW = window_extents((mh_out, mw_out))

    w = jnp.maximum(1, boxes[..., 2] - boxes[..., 0])
    h = jnp.maximum(1, boxes[..., 3] - boxes[..., 1])
    same = (w == obj_hw[..., 1]) & (h == obj_hw[..., 0])
    meta = _window_meta6(boxes, (h_c, w_c), same=same)

    canvas_p = jnp.transpose(canvases, (0, 3, 1, 2))
    hp, wp = _legacy_canvas_pad_hw((h_c, w_c), (MH, MW))
    canvas_p = jnp.pad(canvas_p, ((0, 0), (0, 0), (0, hp - h_c), (0, wp - w_c)))
    objs_p = jnp.transpose(objs, (0, 1, 4, 2, 3))
    out_p = _pallas_compose_planar(canvas_p, objs_p, kh, kv_t, meta, interpret)
    return jnp.transpose(out_p[:, :, :h_c, :w_c], (0, 2, 3, 1))


def _make_blend_kernel(n_obj: int, out_hw: Tuple[int, int]):
    """Blend-only kernel: resized sources are precomputed (XLA resize);
    the kernel DMAs a full-width ROW BAND of the canvas per object (one
    contiguous run per channel plane — window-shaped DMAs fragment into
    ~512-byte row segments and drown in descriptor overhead), blends the
    object's 128-aligned lane sub-window in VMEM, and DMAs the band back.
    This removes the vmapped dynamic-update-slice canvas copies that
    dominate the XLA blend phase (they scale with canvas area)."""
    mh_out, mw_out = out_hw
    MH, MW = window_extents(out_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               band_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _():
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]

                band_slice = out_ref.at[b, :, pl.ds(ws_y, MH), :]
                dma_in = pltpu.make_async_copy(band_slice, band_ref, sem_in)
                dma_in.start()
                dma_src = pltpu.make_async_copy(
                    src_all_ref.at[b, k], src_vmem, sem_src
                )
                dma_src.start()
                dma_src.wait()

                src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)
                src_shift[:, 8 : 8 + src_vmem.shape[1], :] = src_vmem[...]
                rows = jax.lax.switch(
                    dy,
                    [
                        (lambda d: lambda: src_shift[:, 8 - d : 8 - d + MH, :])(d)
                        for d in range(8)
                    ],
                )
                src = pltpu.roll(
                    jnp.pad(rows, ((0, 0), (0, 0), (0, MW - rows.shape[2]))).astype(
                        jnp.int32
                    ),
                    dx,
                    axis=2,
                )

                dma_in.wait()
                dst = band_ref[:, :, pl.ds(ws_x, MW)].astype(jnp.int32)
                band_ref[:, :, pl.ds(ws_x, MW)] = _alpha_over_planar(
                    dst, src
                ).astype(jnp.uint8)
                dma_out = pltpu.make_async_copy(band_ref, band_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_planar(
    canvas_p: jnp.ndarray,  # [B, 4, Hp, Wp] u8 (pre-padded by one window)
    src_p: jnp.ndarray,  # [B, N, 4, mh_a, mw_a] u8 (resized, zero outside box)
    meta: jnp.ndarray,  # [B, N, 6]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_p.shape[0], src_p.shape[1]
    mh_a, mw_a = src_p.shape[3], src_p.shape[4]
    wp = canvas_p.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, MH, wp), jnp.uint8),  # full-width row band
            pltpu.VMEM((4, mh_a, mw_a), jnp.uint8),
            pltpu.VMEM((4, MH + 8, mw_a), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel(N, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_p.shape, jnp.uint8),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_p, src_p)


def composite_batch_hybrid(
    canvases: jnp.ndarray,  # [B, H, W, 4] u8
    objs: jnp.ndarray,  # [B, N, mh, mw, 4] u8
    obj_hw: jnp.ndarray,  # [B, N, 2] (h, w)
    boxes: jnp.ndarray,  # [B, N, 4]
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
) -> jnp.ndarray:
    """XLA resize (MXU einsums, traced tables) + Pallas window blends.

    Numerics match ops.compose.composite_canvas (traced-table budget;
    +-1 at rounding boundaries across differently-compiled programs since
    the traced resample is an f32 HIGHEST dot). STATUS: measured SLOWER than the pure-XLA path on v5e (the
    per-object DMA round-trips and dynamic rotates cost more than the XLA
    blend does) — kept as the second Pallas reference path; see the module
    docstring for the optimization plan.
    """
    from .resize import resize_f32

    h_c, w_c = canvases.shape[1], canvases.shape[2]
    ph, pw = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (ph, pw)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))

    def resize_one(obj, hw, box):
        w = jnp.maximum(1, box[2] - box[0])
        h = jnp.maximum(1, box[3] - box[1])
        return resize_f32(
            obj.astype(jnp.float32), (hw[0], hw[1]), (h, w), (mh_a, mw_a), method
        )

    resized = jax.vmap(jax.vmap(resize_one))(objs, obj_hw, boxes)
    src_p = jnp.transpose(resized.astype(jnp.uint8), (0, 1, 4, 2, 3))

    meta = _window_meta6(boxes, (h_c, w_c))

    canvas_p = jnp.transpose(canvases, (0, 3, 1, 2))
    hp, wp = _legacy_canvas_pad_hw((h_c, w_c), (MH, MW))
    canvas_p = jnp.pad(canvas_p, ((0, 0), (0, 0), (0, hp - h_c), (0, wp - w_c)))
    out_p = _pallas_blend_planar(canvas_p, src_p, meta, interpret)
    return jnp.transpose(out_p[:, :, :h_c, :w_c], (0, 2, 3, 1))


def _unpack_rgba_u32(v_i32):
    """Packed little-endian RGBA u32 (as int32 bits) -> (r, g, b, a) int32."""
    r = v_i32 & 255
    g = (v_i32 >> 8) & 255
    b = (v_i32 >> 16) & 255
    a = (v_i32 >> 24) & 255
    return r, g, b, a


def _pack_rgba_u32(r, g, b, a):
    return r | (g << 8) | (b << 16) | (a << 24)


def _alpha_over_packed(dst_v, src_v):
    """Pillow-exact blend on packed-u32 pixels (int32 bit patterns)."""
    dr, dg, db, da = _unpack_rgba_u32(dst_v)
    sr, sg, sb, sa = _unpack_rgba_u32(src_v)
    blend = da * (255 - sa)
    outa255 = sa * 255 + blend
    safe = jnp.where(outa255 == 0, 1, outa255)
    coef1 = _exact_div_i32(sa * (255 * 255 * 128), safe)
    coef2 = (255 * 128) - coef1

    def chan(s, d):
        tmp = s * coef1 + d * coef2 + 0x80 * 128
        return ((((tmp >> 8) + tmp) >> 8) >> 7)

    a_num = outa255 + 0x80
    out_a = ((a_num >> 8) + a_num) >> 8
    out = _pack_rgba_u32(chan(sr, dr), chan(sg, dg), chan(sb, db), out_a)
    return jnp.where(sa == 0, dst_v, out)


def _make_blend_kernel_packed(n_obj: int, src_hw: Tuple[int, int]):
    """Packed-u32 blend kernel: one canvas plane, contiguous band DMAs,
    channel unpack via shifts — no layout transposes anywhere."""
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               band_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _():
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]

                window_slice = out_ref.at[
                    b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)
                ]
                dma_in = pltpu.make_async_copy(window_slice, band_ref, sem_in)
                dma_in.start()
                dma_src = pltpu.make_async_copy(
                    src_all_ref.at[b, k], src_vmem, sem_src
                )
                dma_src.start()
                dma_src.wait()

                src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)
                src_shift[8 : 8 + mh_a, :] = src_vmem[...]
                rows = jax.lax.switch(
                    dy,
                    [
                        (lambda d: lambda: src_shift[8 - d : 8 - d + MH, :])(d)
                        for d in range(8)
                    ],
                )
                src = pltpu.roll(
                    jnp.pad(rows, ((0, 0), (0, MW - mw_a))), dx, axis=1
                )

                dma_in.wait()
                band_ref[...] = _alpha_over_packed(band_ref[...], src)
                dma_out = pltpu.make_async_copy(band_ref, window_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


def _double_buffered_walk(n_batch, window_dma, compute, aux_dma=None,
                          aux_wait_first=False, pre_loop=None):
    """Shared double-buffer scaffold for the batch-walking kernels.

    The grid iterates OBJECTS; this walks the batch with two VMEM slots so
    the next canvas's window (and optional per-step aux tensor: resized
    source or raw object) prefetches while the current step computes —
    consecutive steps touch different canvases, so there is no aliasing
    hazard, and each step's writeback is waited one iteration later (the
    epilogue waits the last) so all of a grid step's writebacks land
    before the next grid step reuses those canvases (z-order preserved).

    ``window_dma(b, slot, to_vmem)`` -> async-copy descriptor for canvas
    b's window; ``aux_dma(b, slot)`` -> descriptor for the step's second
    inbound tensor (None when the caller fetches it once up front);
    ``compute(b, slot)`` does the step's work for a STATIC slot index
    (dynamic-dim vector loads/stores lower to slow relayouts, so the walk
    branches on the slot); ``aux_wait_first`` waits the aux DMA before the
    window DMA (the fused kernel's historical order); ``pre_loop`` runs
    after the b=0 prefetch starts (one-time shared-asset fetch).
    """
    window_dma(0, 0, True).start()
    if aux_dma is not None:
        aux_dma(0, 0).start()
    if pre_loop is not None:
        pre_loop()

    def body(b, _):
        slot = jax.lax.rem(b, 2)
        nslot = 1 - slot

        # Reuse of buffer nslot requires its previous write-back done.
        @pl.when(b > 0)
        def _():
            window_dma(b - 1, nslot, False).wait()

        @pl.when(b + 1 < n_batch)
        def _():
            window_dma(b + 1, nslot, True).start()
            if aux_dma is not None:
                aux_dma(b + 1, nslot).start()

        if aux_dma is not None and aux_wait_first:
            aux_dma(b, slot).wait()
        window_dma(b, slot, True).wait()
        if aux_dma is not None and not aux_wait_first:
            aux_dma(b, slot).wait()

        jax.lax.switch(slot, [lambda: compute(b, 0), lambda: compute(b, 1)])
        window_dma(b, slot, False).start()
        return ()

    jax.lax.fori_loop(0, n_batch, body, (), unroll=False)
    # Epilogue: last write-back must land before the next grid step
    # touches this canvas's next object (and before program end).
    last = n_batch - 1
    window_dma(last, jax.lax.rem(last, 2), False).wait()


def _make_blend_kernel_aligned(n_batch: int):
    """Minimal packed blend: sources arrive pre-aligned to their window
    (the shift is baked into the resize tables by the producer), so each
    step is DMA-in, blend, DMA-out — double-buffered across the batch
    (grid iterates objects; consecutive steps touch different canvases)."""

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               win_ref, src_vmem, sem_in, sem_src, sem_out):
        del canvas_ref
        k = pl.program_id(0)
        MH, MW = win_ref.shape[1], win_ref.shape[2]

        def window_dma(b, slot, to_vmem):
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
            window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
            if to_vmem:
                return pltpu.make_async_copy(
                    window_slice, win_ref.at[slot], sem_in.at[slot]
                )
            return pltpu.make_async_copy(
                win_ref.at[slot], window_slice, sem_out.at[slot]
            )

        def src_dma(b, slot):
            return pltpu.make_async_copy(
                src_all_ref.at[b, k], src_vmem.at[slot], sem_src.at[slot]
            )

        def compute(b, s: int):
            valid = meta_ref[5, k, b] > 0
            src = jnp.where(valid, src_vmem[s], 0)
            win_ref[s] = _alpha_over_packed(win_ref[s], src)

        _double_buffered_walk(n_batch, window_dma, compute, aux_dma=src_dma)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_aligned(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (pre-padded)
    src_v: jnp.ndarray,  # [B, N, MH, MW] int32 packed, window-aligned
    meta: jnp.ndarray,  # [B, N, 6]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N, MH, MW = src_v.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, MH, MW), jnp.int32),
            pltpu.VMEM((2, MH, MW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_aligned(B),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method"))
def _hybrid_producer_aligned(canvases, objs, obj_hw, boxes, out_max_hw, method):
    """Resize every object DIRECTLY into its window-aligned position: the
    (dy, dx) in-window shift is baked into the coefficient tables (free);
    PIL's identity-size shortcut becomes a shifted copy."""
    from .resize import resize_f32_shifted

    h_c, w_c = canvases.shape[1], canvases.shape[2]
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))

    meta = _window_meta6(boxes, (h_c, w_c))
    dxs = meta[..., 2]
    dys = meta[..., 3]

    def resize_one(obj, hw, box, dy, dx):
        w = jnp.maximum(1, box[2] - box[0])
        h = jnp.maximum(1, box[3] - box[1])
        objf = obj.astype(jnp.float32)
        resized = resize_f32_shifted(
            objf, (hw[0], hw[1]), (h, w), (dy, dx), (MH, MW), method
        )
        # PIL identity shortcut: plain copy, shifted into position.
        ident = jax.lax.dynamic_update_slice(
            jnp.zeros((MH, MW, 4), jnp.float32), objf, (dy, dx, 0)
        )
        same = (w == hw[1]) & (h == hw[0])
        return jnp.where(same, ident, resized)

    aligned = jax.vmap(jax.vmap(resize_one))(objs, obj_hw, boxes, dys, dxs)
    src_v = jax.lax.bitcast_convert_type(aligned.astype(jnp.uint8), jnp.int32)

    canvas_v = jax.lax.bitcast_convert_type(canvases, jnp.int32)
    hp, wp = _legacy_canvas_pad_hw((h_c, w_c), (MH, MW))
    canvas_v = jnp.pad(canvas_v, ((0, 0), (0, hp - h_c), (0, wp - w_c)))
    return canvas_v, src_v, meta


def composite_batch_aligned(
    canvases: jnp.ndarray,
    objs: jnp.ndarray,
    obj_hw: jnp.ndarray,
    boxes: jnp.ndarray,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fastest compose path: shift-baked XLA resize + minimal packed-u32
    double-buffered Pallas blends (pure DMA+blend per step)."""
    h_c, w_c = canvases.shape[1], canvases.shape[2]
    ph, pw = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (ph, pw)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    canvas_v, src_v, meta = _hybrid_producer_aligned(
        canvases, objs, obj_hw, boxes, (mh_a, mw_a), method
    )
    out_v = _pallas_blend_aligned(canvas_v, src_v, meta, interpret)
    return jax.lax.bitcast_convert_type(out_v[:, :h_c, :w_c], jnp.uint8)


def _make_blend_kernel_packed_pipelined(n_batch: int, src_hw: Tuple[int, int]):
    """Packed-u32 blend with double-buffered DMAs.

    Grid iterates OBJECTS; a fori_loop walks the batch, so consecutive
    steps touch different canvases and the next step's window/source DMAs
    overlap the current blend with no aliasing hazard (same-canvas object
    ordering is preserved by the sequential grid + an epilogue wait).
    """
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               win_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        k = pl.program_id(0)

        def window_dma(b, slot, to_vmem):
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
            window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
            if to_vmem:
                return pltpu.make_async_copy(
                    window_slice, win_ref.at[slot], sem_in.at[slot]
                )
            return pltpu.make_async_copy(
                win_ref.at[slot], window_slice, sem_out.at[slot]
            )

        def src_dma(b, slot):
            return pltpu.make_async_copy(
                src_all_ref.at[b, k], src_vmem.at[slot], sem_src.at[slot]
            )

        def compute(b, s: int):
            dx = meta_ref[2, k, b]
            dy = meta_ref[3, k, b]
            valid = meta_ref[5, k, b] > 0
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)
            src_shift[8 : 8 + mh_a, :] = src_vmem[s]
            rows = jax.lax.switch(
                dy,
                [
                    (lambda d: lambda: src_shift[8 - d : 8 - d + MH, :])(d)
                    for d in range(8)
                ],
            )
            src = pltpu.roll(
                jnp.pad(rows, ((0, 0), (0, MW - mw_a))), dx, axis=1
            )
            # invalid object => zero source (alpha 0) => dst passthrough
            src = jnp.where(valid, src, 0)
            win_ref[s] = _alpha_over_packed(win_ref[s], src)

        _double_buffered_walk(n_batch, window_dma, compute, aux_dma=src_dma)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_packed_pipelined(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed RGBA (pre-padded)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed
    meta: jnp.ndarray,  # [B, N, 6]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, MH, MW), jnp.int32),
            pltpu.VMEM((2, mh_a, mw_a), jnp.int32),
            pltpu.VMEM((MH + 8, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_packed_pipelined(B, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)



def _shift_roll_mask(src_shift, src_val, dy, dx, MH: int, MW: int,
                     clamp_dy: bool = False):
    """Position a window-unaligned source inside its clamped window.

    Shared by every clamped-geometry blend kernel: store the [mh_a, mw_a]
    source at static rows [MH, MH+mh_a) of the zero-bordered shift scratch,
    realize the row offset dy as a %8 dynamic load + static fine slice,
    then the lane offset dx as a roll with the wrap columns masked to zero
    (they are exactly the off-canvas columns PIL's crop discards).
    ``clamp_dy`` is for unguarded callers: dropped objects can carry
    dy == MH, which would push the load start negative.
    """
    mh_a, mw_a = src_val.shape
    src_shift[MH : MH + mh_a, :] = src_val
    if clamp_dy:
        dy = jnp.minimum(dy, MH - 1)
    fine = jax.lax.rem(dy, 8)
    coarse8 = dy - fine
    start8 = pl.multiple_of(MH - 8 - coarse8, 8)
    tall = src_shift[pl.ds(start8, MH + 8), :]
    rows = jax.lax.switch(
        fine,
        [(lambda d: lambda: tall[8 - d : 8 - d + MH, :])(d) for d in range(8)],
    )
    rolled = pltpu.roll(jnp.pad(rows, ((0, 0), (0, MW - mw_a))), dx, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (MH, MW), 1)
    return jnp.where(lane >= dx, rolled, 0)


def _make_blend_kernel_packed_clamped(n_obj: int, src_hw: Tuple[int, int]):
    """Clamped-window packed blend (v2 of the packed kernel).

    Window origins clamp to the canvas interior instead of relying on a
    one-window canvas pre-pad (which cost a ~200 MB padded-copy in the
    producer and a cropping copy after). Consequences handled here:

    - dy/dx now range up to the window extent, not (8, 128): rows shift via
      a %8-aligned dynamic load + the static 8-way fine slice; columns roll
      as before but lanes < dx mask to zero (they would otherwise receive
      the wrap-around of object columns that fall off the canvas' right
      edge — exactly the columns PIL's crop discards);
    - the shift scratch zero-fills ONCE per grid program (the object region
      is fully overwritten every step; the old kernel re-zeroed per step).
    """
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               band_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _():
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]

                window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
                dma_in = pltpu.make_async_copy(window_slice, band_ref, sem_in)
                dma_in.start()
                dma_src = pltpu.make_async_copy(
                    src_all_ref.at[b, k], src_vmem, sem_src
                )
                dma_src.start()
                dma_src.wait()

                src = _shift_roll_mask(src_shift, src_vmem[...], dy, dx, MH, MW)

                dma_in.wait()
                band_ref[...] = _alpha_over_packed(band_ref[...], src)
                dma_out = pltpu.make_async_copy(band_ref, window_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


def _make_blend_kernel_clamped_batchsrc(n_obj: int, src_hw: Tuple[int, int]):
    """Clamped blend with ONE source DMA per canvas.

    The kernel is DMA-issue bound (STATUS item 8); all N object sources of
    a canvas are contiguous in HBM, so fetching them in a single
    [N, mh_a, mw_a] copy saves 2(N-1) DMA ops per canvas vs per-object
    fetches, overlapped with the first window fetch.
    """
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               band_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        dma_src = pltpu.make_async_copy(src_all_ref.at[b], src_vmem, sem_src)
        dma_src.start()
        dma_src.wait()

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _(k=k):
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]

                window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
                dma_in = pltpu.make_async_copy(window_slice, band_ref, sem_in)
                dma_in.start()

                src = _shift_roll_mask(src_shift, src_vmem[k], dy, dx, MH, MW)

                dma_in.wait()
                band_ref[...] = _alpha_over_packed(band_ref[...], src)
                dma_out = pltpu.make_async_copy(band_ref, window_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_clamped_batchsrc(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (tile-aligned only)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed
    meta: jnp.ndarray,  # [B, N, 6]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((MH, MW), jnp.int32),
            pltpu.VMEM((N, mh_a, mw_a), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_clamped_batchsrc(N, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


def _make_blend_kernel_resident(n_obj: int, src_hw: Tuple[int, int]):
    """Canvas-RESIDENT blend: one canvas DMA round-trip per canvas.

    The per-object window kernels pay ~29 us of DMA round-trip latency per
    object-step (STATUS item 8). When the packed canvas fits VMEM (1080p =
    8.3 MB), DMA it in ONCE, blend every object into the resident copy
    (window = a dynamic %8/%128 sub-slice of the VMEM canvas), and DMA it
    back ONCE: 3 round-trips per canvas instead of 3 per object. Sources
    for all N objects arrive in one contiguous copy.
    """
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               canvas_vmem, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        dma_in = pltpu.make_async_copy(out_ref.at[b], canvas_vmem, sem_in)
        dma_in.start()
        dma_src = pltpu.make_async_copy(src_all_ref.at[b], src_vmem, sem_src)
        dma_src.start()
        dma_src.wait()
        dma_in.wait()

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _(k=k):
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]
                src = _shift_roll_mask(src_shift, src_vmem[k], dy, dx, MH, MW)
                dst = canvas_vmem[pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
                canvas_vmem[pl.ds(ws_y, MH), pl.ds(ws_x, MW)] = (
                    _alpha_over_packed(dst, src)
                )

        dma_out = pltpu.make_async_copy(canvas_vmem, out_ref.at[b], sem_out)
        dma_out.start()
        dma_out.wait()

    return kernel


# Conservative VMEM budget for the resident canvas + scratch (v5e VMEM is
# ~64-128 MiB but leave headroom for Mosaic's own buffers and the window
# scratch); larger canvases fall back to the windowed clamped kernel.
_RESIDENT_VMEM_BUDGET_BYTES = 24 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_resident(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (tile-aligned only)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed
    meta: jnp.ndarray,  # [B, N, 6] (ws clamped to the canvas interior)
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    hp, wp = canvas_v.shape[1], canvas_v.shape[2]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.int32),  # resident canvas
            pltpu.VMEM((N, mh_a, mw_a), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_resident(N, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


def _make_blend_kernel_band(n_obj: int, src_hw: Tuple[int, int]):
    """Clamped-window blend with full-width ROW-BAND DMAs.

    The window-slice DMA of the clamped kernel fragments into MH row-segment
    descriptors (a [MH, MW] slice of the [Hp, Wp] canvas plane is 216
    non-contiguous 2 KB runs) — measured ~29 us/object-step of pure DMA cost
    vs ~5 us of compute. A full-width band out_ref[b, ws_y:ws_y+MH, :] is
    ONE contiguous run: 4x the bytes, 1/216 the descriptors. The blend then
    targets the 128-aligned lane sub-window of the band in VMEM.
    """
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               band_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _():
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]
                dy = meta_ref[3, k, b]

                band_slice = out_ref.at[b, pl.ds(ws_y, MH), :]
                dma_in = pltpu.make_async_copy(band_slice, band_ref, sem_in)
                dma_in.start()
                dma_src = pltpu.make_async_copy(
                    src_all_ref.at[b, k], src_vmem, sem_src
                )
                dma_src.start()
                dma_src.wait()

                src = _shift_roll_mask(src_shift, src_vmem[...], dy, dx, MH, MW)

                dma_in.wait()
                dst = band_ref[:, pl.ds(ws_x, MW)]
                band_ref[:, pl.ds(ws_x, MW)] = _alpha_over_packed(dst, src)
                dma_out = pltpu.make_async_copy(band_ref, band_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_band(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (tile-aligned only)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed
    meta: jnp.ndarray,  # [B, N, 6] (ws clamped to the canvas interior)
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    wp = canvas_v.shape[2]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((MH, wp), jnp.int32),  # full-width row band
            pltpu.VMEM((mh_a, mw_a), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_band(N, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


def _make_blend_kernel_clamped_pipelined(n_batch: int, src_hw: Tuple[int, int]):
    """Clamped-window blend with double-buffered DMAs.

    Grid iterates OBJECTS; a fori_loop walks the batch (consecutive steps
    touch different canvases, so prefetching the next step's window/source
    overlaps the current blend with no aliasing hazard). Same clamped
    geometry as _make_blend_kernel_packed_clamped: %8 dynamic row load +
    static fine slice for large dy, post-roll lane mask for large dx.
    """
    mh_a, mw_a = src_hw
    MH, MW = window_extents(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               win_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
        del canvas_ref
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        def window_dma(b, slot, to_vmem):
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
            window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
            if to_vmem:
                return pltpu.make_async_copy(
                    window_slice, win_ref.at[slot], sem_in.at[slot]
                )
            return pltpu.make_async_copy(
                win_ref.at[slot], window_slice, sem_out.at[slot]
            )

        def src_dma(b, slot):
            return pltpu.make_async_copy(
                src_all_ref.at[b, k], src_vmem.at[slot], sem_src.at[slot]
            )

        def compute(b, s: int):
            dx = meta_ref[2, k, b]
            dy = meta_ref[3, k, b]
            valid = meta_ref[5, k, b] > 0
            # compute is unguarded here (result masked by `valid`), so
            # clamp the dropped-object dy == MH case inside the helper
            src = _shift_roll_mask(
                src_shift, src_vmem[s], dy, dx, MH, MW, clamp_dy=True
            )
            src = jnp.where(valid, src, 0)
            win_ref[s] = _alpha_over_packed(win_ref[s], src)

        _double_buffered_walk(n_batch, window_dma, compute, aux_dma=src_dma)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_clamped_pipelined(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (tile-aligned only)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed
    meta: jnp.ndarray,  # [B, N, 6] (ws clamped to the canvas interior)
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, MH, MW), jnp.int32),
            pltpu.VMEM((2, mh_a, mw_a), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_clamped_pipelined(B, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_packed_clamped(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (tile-aligned only)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed (zero outside box)
    meta: jnp.ndarray,  # [B, N, 6] (ws clamped to the canvas interior)
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((MH, MW), jnp.int32),
            pltpu.VMEM((mh_a, mw_a), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_packed_clamped(N, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


def _blend_clamped_finish_impl(canvas_v, src_v, meta, out_hw, interpret, packed):
    """Clamped blend with crop (+ u8 bitcast unless ``packed``) in-program.

    Profiling (benchmarks/analyze_trace.py on the bench batch) showed the
    copies AROUND the kernel dominated: an eager output bitcast runs as
    its own program (an eager op cannot alias its live input => a
    full-canvas copy), an undonated canvas_v forces a defensive copy
    before the kernel's in-place writes, and materializing u8 NHWC on
    device costs three full-canvas passes. ``packed`` returns the packed
    u32 plane instead — its HOST bytes are already the little-endian RGBA
    image (see packed_to_u8_np), verified bit-identical on hardware.

    Traces through _pallas_blend_packed_clamped (jit-in-jit inlines), so
    the kernel wiring lives in one place.
    """
    out_v = _pallas_blend_packed_clamped(canvas_v, src_v, meta, interpret)
    h_c, w_c = out_hw
    out_v = out_v[:, :h_c, :w_c]
    if packed:
        return out_v
    return jax.lax.bitcast_convert_type(out_v, jnp.uint8)


# Donation of canvas_v is only USABLE when the crop is an identity AND
# the output stays packed i32 (the output then reuses the buffer); a
# cropped output cannot alias it, and neither can the u8-bitcast output
# (same bytes, but XLA's donation matching pairs buffers by dtype+dims,
# so the i32 plane never aliases a u8[..., 4] result — the donate hint
# just warned per compile while the defensive copy stayed). Pick the
# right jitted variant statically.
_STATICS = ("out_hw", "interpret", "packed")
_blend_finish_donated = functools.partial(
    jax.jit, static_argnames=_STATICS, donate_argnums=(0,)
)(_blend_clamped_finish_impl)
_blend_finish_plain = functools.partial(
    jax.jit, static_argnames=_STATICS
)(_blend_clamped_finish_impl)


def _pallas_blend_clamped_finish(canvas_v, src_v, meta, out_hw, interpret=False,
                                 packed=False):
    identity_crop = (canvas_v.shape[1], canvas_v.shape[2]) == tuple(out_hw)
    fn = _blend_finish_donated if (identity_crop and packed) else _blend_finish_plain
    return fn(canvas_v, src_v, meta, tuple(out_hw), interpret, packed)


def _pallas_blend_clamped_packed_out(canvas_v, src_v, meta, out_hw,
                                     interpret=False):
    return _pallas_blend_clamped_finish(
        canvas_v, src_v, meta, out_hw, interpret, packed=True
    )


def packed_to_u8_np(packed_np) -> "np.ndarray":
    """Host view of a packed u32 canvas as uint8 RGBA [.., H, W, 4] (free)."""
    arr = np.ascontiguousarray(packed_np)
    return arr.view(np.uint8).reshape(*arr.shape, 4)


# Rec.709 luminance weights — the ONE home for the stat's constants
# (pipeline/fused.py and parallel/sweep.py import these; keep in sync
# with nothing: everything else must reference this tuple).
REC709 = (0.2126, 0.7152, 0.0722)


def _packed_weighted_lum(crop_i32: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel Rec.709 luminance of a packed-u32 plane batch."""
    wr, wg, wb = REC709
    return (
        wr * (crop_i32 & 255).astype(jnp.float32)
        + wg * ((crop_i32 >> 8) & 255).astype(jnp.float32)
        + wb * ((crop_i32 >> 16) & 255).astype(jnp.float32)
    )


def packed_luma(crop_i32: jnp.ndarray) -> jnp.ndarray:
    """Mean Rec.709 luminance per canvas of a packed-u32 batch [B, H, W].

    Single pass: the weighted per-pixel luminance reduces once instead of
    three per-channel means (three separate reduces each re-read the full
    plane — ~6 GB/batch at 4K b64). Same value: mean is linear, so
    mean(Σ wᵢ cᵢ) == Σ wᵢ mean(cᵢ) up to f32 reduction rounding.
    """
    return jnp.mean(_packed_weighted_lum(crop_i32), axis=(1, 2))


def packed_luma_masked(crop_i32: jnp.ndarray,
                       canvas_wh: jnp.ndarray) -> jnp.ndarray:
    """Masked mean Rec.709 luminance per canvas of a packed-u32 batch.

    Each batch element averages only its TRUE (W, H) extent of the padded
    plane (``canvas_wh`` is [B, 2] as (W, H)) — the fused multi-ratio
    path's out-of-canvas area is garbage-by-construction and must not
    contaminate the run-level stat. Same single-pass weighted reduce as
    :func:`packed_luma`."""
    _, Hp, Wp = crop_i32.shape
    lum = _packed_weighted_lum(crop_i32)
    row = jnp.arange(Hp, dtype=jnp.int32)[None, :, None] < (
        canvas_wh[:, 1][:, None, None]
    )
    col = jnp.arange(Wp, dtype=jnp.int32)[None, None, :] < (
        canvas_wh[:, 0][:, None, None]
    )
    mask = (row & col).astype(jnp.float32)
    denom = jnp.maximum(
        1.0, (canvas_wh[:, 0] * canvas_wh[:, 1]).astype(jnp.float32)
    )
    return jnp.sum(lum * mask, axis=(1, 2)) / denom


def _make_blend_kernel_rowbaked(n_obj: int, src_hw: Tuple[int, int]):
    """v3 packed blend: clamped windows + row shift baked by the producer.

    The producer resizes each object directly to its window-aligned ROW
    position (dy folded into the V-pass coefficient table for free — the
    source tensor is [MH, mw_a], rows outside [dy, dy+h) zero), so each
    kernel step is just: DMA window + source, lane-roll by dx, mask the
    wrap, blend, DMA back. No shift scratch, no row switch.
    """
    mh_src, mw_a = src_hw  # mh_src == MH already
    MH, MW = window_extents_rowbaked(src_hw)

    def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
               band_ref, src_vmem, sem_in, sem_src, sem_out):
        del canvas_ref
        b = pl.program_id(0)

        for k in range(n_obj):
            valid = meta_ref[5, k, b] > 0

            @pl.when(valid)
            def _():
                ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
                ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
                dx = meta_ref[2, k, b]

                window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
                dma_in = pltpu.make_async_copy(window_slice, band_ref, sem_in)
                dma_in.start()
                dma_src = pltpu.make_async_copy(
                    src_all_ref.at[b, k], src_vmem, sem_src
                )
                dma_src.start()
                dma_src.wait()

                rolled = pltpu.roll(
                    jnp.pad(src_vmem[...], ((0, 0), (0, MW - mw_a))), dx, axis=1
                )
                lane = jax.lax.broadcasted_iota(jnp.int32, (MH, MW), 1)
                src = jnp.where(lane >= dx, rolled, 0)

                dma_in.wait()
                band_ref[...] = _alpha_over_packed(band_ref[...], src)
                dma_out = pltpu.make_async_copy(band_ref, window_slice, sem_out)
                dma_out.start()
                dma_out.wait()

    return kernel


def window_extents_rowbaked(src_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Row-baked sources already span the full window height."""
    mh_src, mw_a = src_hw
    return mh_src, _round_up(mw_a + 128, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_rowbaked(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed (tile-aligned only)
    src_v: jnp.ndarray,  # [B, N, MH, mw_a] int32 packed, rows window-aligned
    meta: jnp.ndarray,  # [B, N, 6]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_src, mw_a = src_v.shape[2], src_v.shape[3]
    MH, MW = window_extents_rowbaked((mh_src, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((MH, MW), jnp.int32),
            pltpu.VMEM((mh_src, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_rowbaked(N, (mh_src, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method"))
def _hybrid_producer_rowbaked(canvases, objs, obj_hw, boxes, out_max_hw, method):
    """Producer for the row-baked kernel: each object resamples DIRECTLY to
    its in-window row offset (dy folded into the V coefficient table —
    zero extra matmul cost beyond MH/mh_a ~ 4% more table rows); the PIL
    identity-size shortcut becomes a row-shifted copy."""
    from .resize import resize_f32_shifted

    h_c, w_c = canvases.shape[1], canvases.shape[2]
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))
    hp = max(_round_up(h_c, 8), MH)
    wp = max(_round_up(w_c, 128), MW)

    meta = _window_meta6(boxes, (h_c, w_c), origin_cap=(hp - MH, wp - MW))
    dys = meta[..., 3]

    def resize_one(obj, hw, box, dy):
        w = jnp.maximum(1, box[2] - box[0])
        h = jnp.maximum(1, box[3] - box[1])
        objf = obj.astype(jnp.float32)
        resized = resize_f32_shifted(
            objf, (hw[0], hw[1]), (h, w), (dy, 0), (MH, mw_a), method
        )
        # Identity copy shifted to row dy, with bottom-of-window crop
        # semantics (dynamic_update_slice would CLAMP the start and
        # mis-position objects near the canvas bottom — slice out of a
        # top-padded buffer instead, which never clamps). Crop first: the
        # object storage pad may exceed the requested out_max window
        # (jnp.pad rejects negative widths).
        crop = objf[: min(obj.shape[0], MH), : min(obj.shape[1], mw_a)]
        big = jnp.pad(
            crop,
            ((MH, MH - crop.shape[0]), (0, mw_a - crop.shape[1]), (0, 0)),
        )
        ident = jax.lax.dynamic_slice(big, (MH - dy, 0, 0), (MH, mw_a, 4))
        same = (w == hw[1]) & (h == hw[0])
        return jnp.where(same, ident, resized)

    resized = jax.vmap(jax.vmap(resize_one))(objs, obj_hw, boxes, dys)
    src_v = jax.lax.bitcast_convert_type(resized.astype(jnp.uint8), jnp.int32)

    canvas_v = jax.lax.bitcast_convert_type(canvases, jnp.int32)
    canvas_v = jnp.pad(canvas_v, ((0, 0), (0, hp - h_c), (0, wp - w_c)))
    return canvas_v, src_v, meta


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method", "clamp"))
def _hybrid_producer_impl(canvases, objs, obj_hw, boxes, out_max_hw, method, clamp):
    """Resize all objects + build the packed canvas/meta for a blend kernel.

    ``clamp=True`` (the bench-default geometry): window origins clamp to
    the canvas interior, so the canvas pads only to DMA tile alignment
    (%8 rows, %128 cols, and at least one window). ``clamp=False`` (the
    original packed kernels): origins are unclamped, so the canvas
    pre-pads by a full window extent on the bottom/right.
    """
    from .resize import resize_f32

    h_c, w_c = canvases.shape[1], canvases.shape[2]
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))
    if clamp:
        hp = max(_round_up(h_c, 8), MH)
        wp = max(_round_up(w_c, 128), MW)
    else:
        hp = _round_up(h_c + MH, 8)
        wp = _round_up(w_c + MW, 128)

    def resize_one(obj, hw, box):
        w = jnp.maximum(1, box[2] - box[0])
        h = jnp.maximum(1, box[3] - box[1])
        # cast inside the vmapped fn: the u8 convert fuses into the final
        # resize fusion (a separate astype materialized the f32 buffer,
        # ~82 MB/batch of extra round-trip)
        return resize_f32(
            obj.astype(jnp.float32), (hw[0], hw[1]), (h, w), (mh_a, mw_a), method
        ).astype(jnp.uint8)

    resized = jax.vmap(jax.vmap(resize_one))(objs, obj_hw, boxes)
    src_v = jax.lax.bitcast_convert_type(resized, jnp.int32)

    cap = (hp - MH, wp - MW) if clamp else None
    meta = _window_meta6(boxes, (h_c, w_c), origin_cap=cap)

    canvas_v = jax.lax.bitcast_convert_type(canvases, jnp.int32)  # [B, H, W]
    canvas_v = jnp.pad(canvas_v, ((0, 0), (0, hp - h_c), (0, wp - w_c)))
    return canvas_v, src_v, meta


def _hybrid_producer_clamped(canvases, objs, obj_hw, boxes, out_max_hw, method):
    return _hybrid_producer_impl(
        canvases, objs, obj_hw, boxes, out_max_hw, method, clamp=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_blend_packed(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] int32 packed RGBA (pre-padded)
    src_v: jnp.ndarray,  # [B, N, mh_a, mw_a] int32 packed (zero outside box)
    meta: jnp.ndarray,  # [B, N, 6]
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = src_v.shape[0], src_v.shape[1]
    mh_a, mw_a = src_v.shape[2], src_v.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((MH, MW), jnp.int32),
            pltpu.VMEM((mh_a, mw_a), jnp.int32),
            pltpu.VMEM((MH + 8, mw_a), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_blend_kernel_packed(N, (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, src_v)


def _hybrid_producer(canvases, objs, obj_hw, boxes, out_max_hw, method):
    return _hybrid_producer_impl(
        canvases, objs, obj_hw, boxes, out_max_hw, method, clamp=False
    )


def composite_batch_hybrid_packed(
    canvases: jnp.ndarray,  # [B, H, W, 4] u8
    objs: jnp.ndarray,  # [B, N, mh, mw, 4] u8
    obj_hw: jnp.ndarray,  # [B, N, 2] (h, w)
    boxes: jnp.ndarray,  # [B, N, 4]
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
    pipelined: bool = False,
    clamped: bool = False,
    rowbaked: bool = False,
    band: bool = False,
    batchsrc: bool = False,
    resident: bool = False,
    packed_out: bool = False,
) -> jnp.ndarray:
    """XLA resize + packed-u32 Pallas window blends, zero transposes.

    Pixels stay in NHWC memory order throughout: the RGBA quartet bitcasts
    to one u32 lane (free), so the kernel sees a single [H, W] plane with
    contiguous band rows and unpacks channels with shifts. Numerics match
    ops.compose.composite_canvas (traced-table budget).

    The producer and the kernel run as SEPARATE jit programs: embedding the
    pallas_call inside the producer program made XLA schedule it ~25x
    slower (copies/layout constraints around the custom call); two
    dispatches cost ~60 us on the tunnel and keep both parts fast.
    """
    h_c, w_c = canvases.shape[1], canvases.shape[2]
    ph, pw = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (ph, pw)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)

    if packed_out and not (clamped and not (band or batchsrc or resident
                                            or pipelined or rowbaked)):
        raise ValueError(
            "packed_out is only supported on the default clamped path"
        )
    if rowbaked:
        canvas_v, src_v, meta = _hybrid_producer_rowbaked(
            canvases, objs, obj_hw, boxes, (mh_a, mw_a), method
        )
        out_v = _pallas_blend_rowbaked(canvas_v, src_v, meta, interpret)
        return jax.lax.bitcast_convert_type(out_v[:, :h_c, :w_c], jnp.uint8)
    if clamped or band or batchsrc or resident:
        canvas_v, src_v, meta = _hybrid_producer_clamped(
            canvases, objs, obj_hw, boxes, (mh_a, mw_a), method
        )
        n = objs.shape[1]
        hp, wp = canvas_v.shape[1], canvas_v.shape[2]
        resident_bytes = 4 * (hp * wp + n * mh_a * mw_a + 2 * mh_a * mw_a)
        if resident and resident_bytes <= _RESIDENT_VMEM_BUDGET_BYTES:
            blend_c = _pallas_blend_resident
            out_v = blend_c(canvas_v, src_v, meta, interpret)
            return jax.lax.bitcast_convert_type(out_v[:, :h_c, :w_c], jnp.uint8)
        if batchsrc:
            blend_c = _pallas_blend_clamped_batchsrc
        elif band:
            blend_c = _pallas_blend_band
        elif pipelined:
            blend_c = _pallas_blend_clamped_pipelined
        else:
            # the default clamped path fuses crop+bitcast into the program
            # and donates the canvas buffer (see _pallas_blend_clamped_finish)
            if packed_out:
                return _pallas_blend_clamped_packed_out(
                    canvas_v, src_v, meta, (h_c, w_c), interpret
                )
            return _pallas_blend_clamped_finish(
                canvas_v, src_v, meta, (h_c, w_c), interpret
            )
        out_v = blend_c(canvas_v, src_v, meta, interpret)
        return jax.lax.bitcast_convert_type(out_v[:, :h_c, :w_c], jnp.uint8)
    canvas_v, src_v, meta = _hybrid_producer(
        canvases, objs, obj_hw, boxes, (mh_a, mw_a), method
    )
    blend = _pallas_blend_packed_pipelined if pipelined else _pallas_blend_packed
    out_v = blend(canvas_v, src_v, meta, interpret)
    return jax.lax.bitcast_convert_type(out_v[:, :h_c, :w_c], jnp.uint8)


def _make_fused_kernel_v2(
    obj_pad_hw: Tuple[int, int], out_hw: Tuple[int, int]
):
    """Fused resample+blend, generation 2: ONE object per grid step.

    vs gen-1 (composite_batch_pallas): the grid is (B, N) instead of (B,)
    with an unrolled N-object loop — the kernel body (and its full matmul
    graph) compiles ONCE, fixing the 29-minute compile; the blend tail is
    the clamped-window packed machinery (no full-window canvas pre-pad);
    row-major grid order preserves z-order (all objects of canvas b finish
    before b+1 starts, and same-canvas steps are sequential).

    The win over the XLA producer: the 3-limb exact dot accumulators stay
    in VMEM/registers (the XLA form pays two ~80 MB/batch f32 round-trips
    for its 3x-wide limb outputs), and the combine/unpremultiply/pack
    chains never touch HBM.
    """
    ph_a, pw_a = obj_pad_hw
    mh_a, mw_a = out_hw  # tile-aligned resized extent
    MH, MW = window_extents(out_hw)

    def kernel(meta_ref, canvas_ref, objs_ref, kh_ref, kv_ref, out_ref,
               win_ref, src_shift, obj_vmem, kh_vmem, kv_vmem,
               sem_in, sem_out, sem_obj, sem_kh, sem_kv):
        del canvas_ref
        b = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when((b == 0) & (k == 0))
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        valid = meta_ref[5, k, b] > 0

        @pl.when(valid)
        def _():
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
            dx = meta_ref[2, k, b]
            dy = meta_ref[3, k, b]
            same = meta_ref[4, k, b] > 0

            d_obj = pltpu.make_async_copy(objs_ref.at[b, k], obj_vmem, sem_obj)
            d_kh = pltpu.make_async_copy(kh_ref.at[b, k], kh_vmem, sem_kh)
            d_kv = pltpu.make_async_copy(kv_ref.at[b, k], kv_vmem, sem_kv)
            d_obj.start()
            d_kh.start()
            d_kv.start()
            window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
            dma_in = pltpu.make_async_copy(window_slice, win_ref, sem_in)
            dma_in.start()

            d_obj.wait()
            d_kh.wait()
            d_kv.wait()

            # --- resample while the window DMA is in flight ---
            obj = obj_vmem[...].astype(jnp.int32)  # [4, ph_a, pw_a]
            alpha = obj[3]
            tmp_p = obj[:3] * alpha[None] + 128
            prem_rgb = ((tmp_p >> 8) + tmp_p) >> 8
            prem = jnp.concatenate([prem_rgb, alpha[None]], axis=0)

            kh = kh_vmem[...]  # [mw_a, pw_a] i32
            kv = kv_vmem[...]  # [ph_a, mh_a] i32 (transposed)

            prem2d = prem.reshape(4 * ph_a, pw_a).astype(jnp.bfloat16)
            ss = _limb_dot(prem2d, kh, 1, 1, k_first=False) + _HALF
            tmp = _clip8(ss).reshape(4, ph_a, mw_a).astype(jnp.bfloat16)

            chans = []
            for c in range(4):
                ss_v = _limb_dot(tmp[c], kv, 0, 0, k_first=True) + _HALF
                # kv lanes pad to %128 for the DMA; rows beyond mh_a are zero
                chans.append(_clip8(ss_v)[:mh_a, :])
            resized_p = jnp.stack(chans, axis=0)  # premultiplied [4, mh_a, mw_a]

            ra = resized_p[3]
            rgb = jnp.minimum(
                255,
                _exact_div_i32(255 * resized_p[:3], jnp.maximum(ra, 1)[None]),
            )
            rgb = jnp.where((ra == 0)[None], resized_p[:3], rgb)
            resized = jnp.concatenate([rgb, ra[None]], axis=0)

            # PIL identity shortcut: plain copy of the (padded) object.
            ch = min(ph_a, mh_a)
            cw = min(pw_a, mw_a)
            ident = jnp.pad(
                obj[:, :ch, :cw],
                ((0, 0), (0, mh_a - ch), (0, mw_a - cw)),
            )
            resized = jnp.where(same, ident, resized)

            # pack u32 and position inside the clamped window
            pk = (
                resized[0]
                | (resized[1] << 8)
                | (resized[2] << 16)
                | (resized[3] << 24)
            )
            src = _shift_roll_mask(src_shift, pk, dy, dx, MH, MW)

            dma_in.wait()
            win_ref[...] = _alpha_over_packed(win_ref[...], src)
            dma_out = pltpu.make_async_copy(win_ref, window_slice, sem_out)
            dma_out.start()
            dma_out.wait()

    return kernel


def _pallas_fused_v2_impl(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] i32 packed (tile-aligned) — DONATED
    objs_p: jnp.ndarray,  # [B, N, 4, ph_a, pw_a] u8 planar
    kh: jnp.ndarray,  # [B, N, mw_a, pw_a] i32
    kv_t: jnp.ndarray,  # [B, N, ph_a, mh_128] i32 (transposed, %128 lanes)
    meta: jnp.ndarray,  # [B, N, 6]
    out_hw: Tuple[int, int],
    out_max_hw: Tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = objs_p.shape[0], objs_p.shape[1]
    ph_a, pw_a = objs_p.shape[3], objs_p.shape[4]
    mh_a, mw_a = out_max_hw
    mh_128 = kv_t.shape[3]
    MH, MW = window_extents((mh_a, mw_a))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((MH, MW), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            pltpu.VMEM((4, ph_a, pw_a), jnp.uint8),
            pltpu.VMEM((mw_a, pw_a), jnp.int32),
            pltpu.VMEM((ph_a, mh_128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_v = pl.pallas_call(
        _make_fused_kernel_v2((ph_a, pw_a), (mh_a, mw_a)),
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, objs_p, kh, kv_t)
    h_c, w_c = out_hw
    return out_v[:, :h_c, :w_c]


_FUSED_STATICS = ("out_hw", "out_max_hw", "interpret")
_fused_v2_donated = functools.partial(
    jax.jit, static_argnames=_FUSED_STATICS, donate_argnums=(0,)
)(_pallas_fused_v2_impl)
_fused_v2_plain = functools.partial(
    jax.jit, static_argnames=_FUSED_STATICS
)(_pallas_fused_v2_impl)


def _pallas_fused_v2(canvas_v, objs_p, kh, kv_t, meta, out_hw, out_max_hw,
                     interpret=False):
    # donation is only USABLE when the output reuses the buffer: an
    # identity crop (else XLA warns per compile and copies defensively)
    identity_crop = (canvas_v.shape[1], canvas_v.shape[2]) == tuple(out_hw)
    fn = _fused_v2_donated if identity_crop else _fused_v2_plain
    return fn(canvas_v, objs_p, kh, kv_t, meta, tuple(out_hw),
              tuple(out_max_hw), interpret)


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method"))
def _fused_v2_producer(canvases, objs, obj_hw, boxes, out_max_hw, method):
    """Tables + planar objects + clamped meta for the fused v2 kernel.

    No resample dots here — only the (VPU-bound) coefficient-table build,
    the object transpose to planar, and the canvas pack.
    """
    from .resize import build_coeffs_traced

    h_c, w_c = canvases.shape[1], canvases.shape[2]
    ph, pw = objs.shape[2], objs.shape[3]
    mh_a, mw_a = out_max_hw
    ph_a = _round_up(ph, 8)
    pw_a = _round_up(pw, 128)
    mh_128 = _round_up(mh_a, 128)
    MH, MW = window_extents((mh_a, mw_a))
    hp = max(_round_up(h_c, 8), MH)
    wp = max(_round_up(w_c, 128), MW)

    def tables_one(hw, box):
        w = jnp.maximum(1, box[2] - box[0])
        h = jnp.maximum(1, box[3] - box[1])
        # build at the UNPADDED in_max (identical f32 wsum reduction order
        # to the XLA resize path — a different tap count flips quantized
        # coefficients by 1 ulp), pad lanes afterwards for the DMA tiling
        kh = jnp.pad(
            build_coeffs_traced(hw[1], w, pw, mw_a, method),
            ((0, 0), (0, pw_a - pw)),
        )
        # kv transposes below: its LANE dim is mh (DMA lanes must tile to
        # %128), so pad table rows to mh_128; the kernel slices the V-pass
        # output back to mh_a (extra rows are zero)
        kv = jnp.pad(
            build_coeffs_traced(hw[0], h, ph, mh_a, method),
            ((0, mh_128 - mh_a), (0, ph_a - ph)),
        )
        same = (w == hw[1]) & (h == hw[0])
        return kh, kv, same

    kh, kv, same = jax.vmap(jax.vmap(tables_one))(obj_hw, boxes)
    kv_t = jnp.swapaxes(kv, 2, 3)

    objs_p = jnp.transpose(
        jnp.pad(objs, ((0, 0), (0, 0), (0, ph_a - ph), (0, pw_a - pw), (0, 0))),
        (0, 1, 4, 2, 3),
    )

    meta = _window_meta6(
        boxes, (h_c, w_c), origin_cap=(hp - MH, wp - MW), same=same
    )

    canvas_v = jax.lax.bitcast_convert_type(canvases, jnp.int32)
    canvas_v = jnp.pad(canvas_v, ((0, 0), (0, hp - h_c), (0, wp - w_c)))
    return canvas_v, objs_p, kh, kv_t, meta


def composite_batch_fused_v2(
    canvases: jnp.ndarray,  # [B, H, W, 4] u8
    objs: jnp.ndarray,  # [B, N, ph, pw, 4] u8
    obj_hw: jnp.ndarray,  # [B, N, 2] (h, w)
    boxes: jnp.ndarray,  # [B, N, 4]
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
    packed_out: bool = False,
) -> jnp.ndarray:
    """Fused resample+blend gen-2 (grid-(B,N); see _make_fused_kernel_v2).

    Numerics: in-kernel 3-limb dots are EXACT integer resampling given the
    (traced) tables — i.e. identical to the XLA path under the exact limb
    resample, within the usual +-1 of the hp-resample bench path.
    """
    h_c, w_c = canvases.shape[1], canvases.shape[2]
    ph, pw = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (ph, pw)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    canvas_v, objs_p, kh, kv_t, meta = _fused_v2_producer(
        canvases, objs, obj_hw, boxes, (mh_a, mw_a), method
    )
    out_v = _pallas_fused_v2(
        canvas_v, objs_p, kh, kv_t, meta, (h_c, w_c), (mh_a, mw_a), interpret
    )
    if packed_out:
        return out_v
    return jax.lax.bitcast_convert_type(out_v, jnp.uint8)


def _trunc_f32(x):
    """Round-toward-zero via floor (Mosaic-safe: f32 trunc may not lower)."""
    return jnp.where(x >= 0, jnp.floor(x), -jnp.floor(-x))


def _coeff_table_in_kernel(
    in_size_s,
    out_size_s,
    n_out: int,
    n_in: int,
    method: str,
    transposed: bool,
    o_offset=None,
):
    """Quantized Pillow coefficient table built from two traced scalars.

    Same arithmetic as resize.resample_coeff_matrix + quantize_coeffs, but
    expressed over a 2D iota so it runs INSIDE a Pallas program (the f32
    wsum reduction order differs from the XLA builder's, so quantized
    entries can flip by 1 ulp — within the traced-table envelope).
    ``transposed`` builds [n_in, n_out] directly (o on the lane axis) so
    the V-pass table never needs an in-kernel transpose. ``o_offset``
    (traced scalar) shifts the output-position axis so callers can build
    an n_out-wide CHUNK of a larger table (STATUS item 17).
    """
    from .resize import _FILTERS, _SUPPORT

    filt = _FILTERS[method]
    in_f = in_size_s.astype(jnp.float32)
    out_f = jnp.maximum(out_size_s.astype(jnp.float32), 1.0)
    scale = in_f / out_f
    fs = jnp.maximum(scale, 1.0)
    support = _SUPPORT[method] * fs
    inv_fs = 1.0 / fs

    shape = (n_in, n_out) if transposed else (n_out, n_in)
    o_axis = 1 if transposed else 0
    # Everything that depends only on the output position o (center,
    # window bounds, tail mask) is computed on a length-n_out vector and
    # BROADCAST into the 2D grid — f32 elementwise ops give bitwise the
    # same values either way, but the o-only chain (~10 ops) drops from
    # n_out*n_in to n_out lanes (measured: the table scaffold, not the
    # Horner filter eval, dominated the build — STATUS item 26).
    # Mosaic's iota is integer-only; widen to f32 after.
    shape_o = (1, n_out) if transposed else (n_out, 1)
    o = jax.lax.broadcasted_iota(jnp.int32, shape_o, o_axis)
    if o_offset is not None:
        o = o + o_offset
    o = o.astype(jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 1 - o_axis).astype(jnp.float32)
    center = (o + 0.5) * scale
    xmin = jnp.clip(_trunc_f32(center - support + 0.5), 0.0, in_f)
    xmax = jnp.clip(_trunc_f32(center + support + 0.5), 0.0, in_f)
    window = (i >= xmin) & (i < xmax)
    w = filt((i - center + 0.5) * inv_fs) * window.astype(jnp.float32)
    wsum = jnp.sum(w, axis=1 - o_axis, keepdims=True)
    w = w / jnp.where(wsum != 0.0, wsum, 1.0)
    w = w * (o < out_f).astype(jnp.float32)
    scaled = w * float(1 << PRECISION_BITS)
    return _trunc_f32(scaled + jnp.where(w < 0, -0.5, 0.5)).astype(jnp.int32)


def _identity_pack_into(pk_ref, obj, obj_pad_hw, out_hw):
    """Pack an identity-size object straight into the packed blend source
    (STATUS item 15: out == in skips the table build and MXU resample).
    ``obj`` is the already-loaded [4, ph_a, pw_a] int32 planar object."""
    ph_a, pw_a = obj_pad_hw
    mh_a, mw_a = out_hw
    ch = min(ph_a, mh_a)
    cw = min(pw_a, mw_a)
    ident = jnp.pad(
        obj[:, :ch, :cw],
        ((0, 0), (0, mh_a - ch), (0, mw_a - cw)),
    )
    pk_ref[:mh_a, :] = (
        ident[0]
        | (ident[1] << 8)
        | (ident[2] << 16)
        | (ident[3] << 24)
    )


def _premultiply2d(obj_i32, ph_k: int, pw_k: int, centered_s8: bool = False):
    """[4, ph_k, pw_k] int32 straight-alpha object -> [4*ph_k, pw_k]
    premultiplied channel-stack (PIL's fixed-point premultiply:
    (x*a + 128) followed by the >>8-twice rounding trick).

    ``centered_s8`` returns the stack already re-centered for the s8 dot
    path (p - 128 as int8, see :func:`_limb_dot_i8`) — the pipelined
    kernel's shared-object scratch stores this form so the re-centering
    runs once per grid step instead of once per object-step (and the
    per-step scratch load halves). Default is the bf16 form the bf16
    limb dots consume."""
    alpha = obj_i32[3]
    tmp_p = obj_i32[:3] * alpha[None] + 128
    prem_rgb = ((tmp_p >> 8) + tmp_p) >> 8
    prem = jnp.concatenate([prem_rgb, alpha[None]], axis=0)
    prem = prem.reshape(4 * ph_k, pw_k)
    if centered_s8:
        return (prem - 128).astype(jnp.int8)
    return prem.astype(jnp.bfloat16)


def _resample_chunked_into(
    pk_ref, tmp_ref, load_prem2d, in_h, in_w, out_h, out_w,
    ph_k: int, pw_k: int, method: str,
):
    """Chunked in-kernel-table resample (STATUS item 17): both passes walk
    only the 128-wide output chunks the object actually produces
    (ceil(out_w/128) H chunks, ceil(out_h/128) x ceil(out_w/128) V tiles —
    STATUS item 25 bounded the V pass by columns too; it used to run the
    full batch-max width); each chunk builds its slice of the coeff table
    in-kernel (o_offset) while the object DMA is in flight. Chunks beyond
    the box are never built or written — the caller's masked src_shift
    write zeroes whatever garbage they leave in the scratches, so the
    blend stays correct. (ph_k, pw_k) are the static object extents this
    branch contracts over — the batch-max pad by default, the object's
    own padded size under static_in_hw (item 19).

    ``load_prem2d`` is a thunk returning the PREMULTIPLIED [4*ph_k, pw_k]
    bf16 channel-stack (see :func:`_premultiply2d`); it runs AFTER the
    chunk counts are computed so the kernels' DMA waits sit at exactly
    the same trace position as before this helper existed (the
    non-pipelined kernel waits its object DMA inside the thunk; the
    pipelined shared-object path reads a per-grid-step hoisted scratch —
    STATUS item 25)."""
    ch_w = jax.lax.div(out_w + 127, 128)
    ch_h = jax.lax.div(out_h + 127, 128)

    prem2d = load_prem2d()
    if INT8_DOTS:
        # s8 MXU path (STATUS item 27): the premultiplied stack arrives
        # already re-centered s8 from the shared-object scratch (hoisted
        # once per grid step — item 28); the per-step fallback re-centers
        # here. The colsum over the contracted in_w axis is shared by
        # every H chunk (only the table varies).
        prem_i8 = (prem2d if prem2d.dtype == jnp.int8
                   else _center_img_s8(prem2d))
        prem_cs = jnp.sum(prem_i8.astype(jnp.int32), axis=1)

    def build_kh(off):
        return _coeff_table_in_kernel(
            in_w, out_w, 128, pw_k, method, False, o_offset=off
        )

    def h_dot_store(lc, kh_c):
        if INT8_DOTS:
            ss = _limb_dot_i8(prem_i8, kh_c, 1, 1, k_first=False,
                              img_colsum=prem_cs) + _HALF
            # store the H intermediate ALREADY re-centered s8 (STATUS
            # item 29): clip8 - 128 here costs the same one subtract the
            # V pass used to pay per tile via _center_img_s8, but runs
            # once per H chunk instead of once per (channel, V tile) —
            # and halves the tmp scratch bytes
            tmp_ref[: 4 * ph_k, pl.ds(lc, 128)] = (
                (_clip8(ss) - 128).astype(jnp.int8)
            )
        else:
            ss = _limb_dot(prem2d, kh_c, 1, 1, k_first=False) + _HALF
            tmp_ref[: 4 * ph_k, pl.ds(lc, 128)] = (
                _clip8(ss).astype(jnp.bfloat16)
            )

    if PIPELINE_TABLES:
        # STATUS item 35: the carried table was built in the PREVIOUS
        # iteration, so this body's table scaffold (for chunk c+1) has no
        # data dependence on this body's dot (chunk c) — straight-line,
        # clamped offset (the last iteration rebuilds its own table into
        # a dead carry), bitwise-identical dot inputs.
        def h_chunk_pipe(c, kh_c):
            kh_next = build_kh(jnp.minimum(c + 1, ch_w - 1) * 128)
            h_dot_store(pl.multiple_of(c * 128, 128), kh_c)
            return kh_next

        jax.lax.fori_loop(0, ch_w, h_chunk_pipe, build_kh(0), unroll=False)
    else:
        def h_chunk(c, _):
            lc = pl.multiple_of(c * 128, 128)
            h_dot_store(lc, build_kh(lc))
            return ()

        jax.lax.fori_loop(0, ch_w, h_chunk, (), unroll=False)

    def build_kv(off):
        kv = _coeff_table_in_kernel(
            in_h, out_h, 128, ph_k, method, True, o_offset=off
        )
        # STATUS item 31: ONE table serves every (channel, column tile)
        # of this row chunk — split its limbs + rowsums once, not
        # 4 x ch_w times inside the dot calls (bitwise-identical)
        return kv, (_split_limbs_i8(kv, 0) if INT8_DOTS else None)

    def v_chunk_body(rc, kv_c, kv_limbs):
        def v_tile(c, _):
            lc = pl.multiple_of(c * 128, 128)
            chans = []
            for c4 in range(4):
                t = tmp_ref[c4 * ph_k : (c4 + 1) * ph_k, pl.ds(lc, 128)]
                if INT8_DOTS:
                    # t arrives centered s8 from the H pass (item 29)
                    ss_v = _limb_dot_i8(
                        t, kv_c, 0, 0, k_first=True, k_limbs=kv_limbs
                    ) + _HALF
                else:
                    ss_v = _limb_dot(t, kv_c, 0, 0, k_first=True) + _HALF
                chans.append(_clip8(ss_v))
            # premultiplied [4, 128, 128] tile
            resized_p = jnp.stack(chans, axis=0)

            ra = resized_p[3]
            rgb = jnp.minimum(
                255,
                _exact_div_i32(
                    255 * resized_p[:3], jnp.maximum(ra, 1)[None]
                ),
            )
            rgb = jnp.where((ra == 0)[None], resized_p[:3], rgb)
            pk_ref[pl.ds(rc, 128), pl.ds(lc, 128)] = (
                rgb[0]
                | (rgb[1] << 8)
                | (rgb[2] << 16)
                | (ra << 24)
            )
            return ()

        jax.lax.fori_loop(0, ch_w, v_tile, (), unroll=False)

    if PIPELINE_TABLES:
        # STATUS item 35 (V pass): build + limb-split row chunk r+1's
        # table before running row chunk r's tile dots (carried pair;
        # clamped offset rebuilds the last chunk's table into a dead
        # carry). Bitwise-identical dot inputs.
        def v_chunk_pipe(r, carry):
            kv_c, kv_limbs = carry
            nxt = build_kv(jnp.minimum(r + 1, ch_h - 1) * 128)
            v_chunk_body(pl.multiple_of(r * 128, 128), kv_c, kv_limbs)
            return nxt

        jax.lax.fori_loop(
            0, ch_h, v_chunk_pipe, build_kv(0), unroll=False
        )
    else:
        def v_chunk(r, _):
            rc = pl.multiple_of(r * 128, 128)
            kv_c, kv_limbs = build_kv(rc)
            v_chunk_body(rc, kv_c, kv_limbs)
            return ()

        jax.lax.fori_loop(0, ch_h, v_chunk, (), unroll=False)


def _emit_resample_branches(k, not_same_thunk, static_in_hw, obj_pad_hw,
                            do_resample):
    """Emit the resample dispatch (STATUS item 19): one generic branch
    when no static sizes are given, else one fully-specialized
    ``pl.when(k == i)`` branch per object index — exactly one runs
    (mutually exclusive on k), so each kernel's object DMA is still
    waited exactly once per step. The static sizes set only the DOT
    extents (an upper-bound cover); the table arithmetic uses the TRACED
    per-element sizes, so batch elements smaller than the cover still
    resample exactly. ``do_resample(ph_k, pw_k)`` is kernel-specific
    (it loads the object from that kernel's VMEM slot);
    ``not_same_thunk`` builds the branch predicate (a thunk so each
    kernel keeps its original trace: the grid-(B,N) kernel re-emits the
    negation per branch, the pipelined one reuses a precomputed value)."""
    ph_a, pw_a = obj_pad_hw
    if static_in_hw is None:
        @pl.when(not_same_thunk())
        def _():
            do_resample(ph_a, pw_a)
    else:
        for i, (h_i, w_i) in enumerate(static_in_hw):
            @pl.when(not_same_thunk() & (k == i))
            def _(h_i=int(h_i), w_i=int(w_i)):
                do_resample(
                    min(_round_up(max(h_i, 1), 8), ph_a),
                    min(_round_up(max(w_i, 1), 128), pw_a),
                )


def _blend_window_rows(
    pk_ref, src_shift, win_get, win_set, wait_window,
    dx, dy, out_h, out_w, out_hw, window_hw,
):
    """Masked source write + row-bounded blend (STATUS items 16/18): the
    object occupies only window rows [dy, dy + out_h) — rows outside
    carry zero alpha (the coeff tables zero columns >= out_h; padded
    objects are zero beyond their box), so the full-window
    shift+roll+blend is a no-op there. Walk only the _BLEND_CHUNK_ROWS
    chunks that intersect the occupied band; untouched rows DMA back
    unchanged. The shift scratch's sub-MH rows stay zero forever (zeroed
    once at the kernel's first grid step), which keeps rows below dy
    reading zero src. The masked write also zeroes garbage left in
    pk_ref by never-built resample chunks and stale rows/cols from a
    previous (larger) object.

    ``win_get(rc, n)`` / ``win_set(rc, n, rows)`` access the window VMEM
    (slot-indexed in the pipelined kernel); ``wait_window`` runs at the
    point the non-pipelined kernel waits its inbound window DMA (a no-op
    thunk in the pipelined kernel, whose body waits before compute)."""
    mh_a, mw_a = out_hw
    MH, MW = window_hw
    C = _BLEND_CHUNK_ROWS
    n_full = MH // C
    tail = MH - n_full * C

    fine = jax.lax.rem(dy, 8)
    coarse8 = dy - fine
    start8 = pl.multiple_of(MH - 8 - coarse8, 8)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (mh_a, mw_a), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (mh_a, mw_a), 1)
    src_shift[MH : MH + mh_a, :] = jnp.where(
        (row_i < out_h) & (col_i < out_w), pk_ref[:mh_a, :], 0
    )
    rows_end = jnp.minimum(dy + out_h, MH)
    c0 = jax.lax.div(dy, C)
    c1 = jax.lax.div(rows_end + (C - 1), C)

    wait_window()

    def blend_rows(rc, n_rows: int):
        # window rows [rc, rc + n_rows) <- shifted/rolled source
        tall = src_shift[pl.ds(start8 + rc, n_rows + 8), :]
        rows = jax.lax.switch(
            fine,
            [(lambda d: lambda: tall[8 - d : 8 - d + n_rows, :])(d)
             for d in range(8)],
        )
        rolled = pltpu.roll(
            jnp.pad(rows, ((0, 0), (0, MW - mw_a))), dx, axis=1
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, MW), 1)
        src_c = jnp.where(lane >= dx, rolled, 0)
        # Full-width blend on purpose: a column-tiled variant (static
        # pl.when tiles over [dx, dx + out_w)) measured only ~+1% on the
        # small-object headline but -10% on the identity/no-scaling
        # workload, whose full-cover blends paid 4 guarded part-ops per
        # row chunk (STATUS item 26c).
        win_rows = win_get(rc, n_rows)
        win_set(rc, n_rows, _alpha_over_packed(win_rows, src_c))

    def blend_chunk(c, _):
        blend_rows(pl.multiple_of(c * C, 8), C)
        return ()

    if n_full:
        jax.lax.fori_loop(
            c0, jnp.minimum(c1, n_full), blend_chunk, (),
            unroll=False,
        )
    if tail:
        @pl.when(rows_end > n_full * C)
        def _():
            blend_rows(n_full * C, tail)


def _make_fused_kernel_v3(
    obj_pad_hw: Tuple[int, int], out_hw: Tuple[int, int], method: str,
    static_in_hw: Tuple[Tuple[int, int], ...] | None = None,
    shared_objs: bool = False,
):
    """Fused resample+blend, generation 3: coefficient tables built
    IN-KERNEL from per-object size scalars.

    vs gen-2: the producer no longer materializes the [B, N, out, in]
    kh/kv tables in HBM (~205 MB per 64-canvas squarespace batch, written
    once and re-read by per-step DMAs) nor pays the VPU-bound Horner build
    as a separate serialized program — the table build happens inside the
    step, hidden under the window/object DMA latency. meta carries four
    extra scalars per object: (in_h, in_w, out_h, out_w).

    ``static_in_hw`` (STATUS item 19): optional per-object STATIC (h, w)
    asset sizes (length must equal the object-grid extent). Within a
    bundle the asset sizes are fixed — only the placement boxes vary per
    render — so the resample section is emitted once per object index as
    a ``pl.when(k == i)`` branch with the dots sized to THAT object's
    padded extents (round_up(h_i, 8), round_up(w_i, 128)) instead of the
    batch-max (ph_a, pw_a). The dropped M rows / K columns all carry zero
    pixels or zero coefficients, so outputs are bitwise identical to the
    generic path; exactly one branch executes per grid step (no dynamic
    fori overhead, unlike the chunked-M attempt in STATUS item 18).

    Correctness contract: each static (h_i, w_i) must be an UPPER BOUND
    on object i's actual (h, w) for every batch element — coefficients
    beyond the traced size are zero and padded pixels are zero, so any
    cover works (exact sizes are tightest; multi-bundle batches use the
    per-index max across bundles). An undersized entry silently truncates
    the resample window.
    """
    ph_a, pw_a = obj_pad_hw
    mh_a, mw_a = out_hw
    MH, MW = window_extents(out_hw)

    def kernel(meta_ref, canvas_ref, objs_ref, out_ref,
               win_ref, src_shift, pk_ref, tmp_ref, obj_vmem,
               sem_in, sem_out, sem_obj):
        del canvas_ref
        b = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when((b == 0) & (k == 0))
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        valid = meta_ref[5, k, b] > 0

        @pl.when(valid)
        def _():
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
            dx = meta_ref[2, k, b]
            dy = meta_ref[3, k, b]
            same = meta_ref[4, k, b] > 0
            in_h = meta_ref[6, k, b]
            in_w = meta_ref[7, k, b]
            out_h = meta_ref[8, k, b]
            out_w = meta_ref[9, k, b]

            # shared_objs: every canvas composites the same assets — read
            # object row 0 of a [1, N, ...] tensor instead of row b
            d_obj = pltpu.make_async_copy(
                objs_ref.at[0 if shared_objs else b, k], obj_vmem, sem_obj
            )
            d_obj.start()
            window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
            dma_in = pltpu.make_async_copy(window_slice, win_ref, sem_in)
            dma_in.start()

            # Identity-size placements (out == in: PIL's identity shortcut —
            # the serving default-layout and agentic no-scaling workloads)
            # take a REAL branch that skips the table build and the MXU
            # resample entirely: the raw object packs straight into the
            # blend source (STATUS item 15). Exactly one branch runs, so
            # the object DMA is waited exactly once.
            @pl.when(same)
            def _():
                d_obj.wait()
                _identity_pack_into(
                    pk_ref, obj_vmem[...].astype(jnp.int32),
                    (ph_a, pw_a), (mh_a, mw_a),
                )

            def resample_into_pk(ph_k: int, pw_k: int):
                def load_prem2d():
                    d_obj.wait()
                    return _premultiply2d(
                        obj_vmem[:, :ph_k, :pw_k].astype(jnp.int32),
                        ph_k, pw_k,
                    )

                _resample_chunked_into(
                    pk_ref, tmp_ref, load_prem2d, in_h, in_w, out_h, out_w,
                    ph_k, pw_k, method,
                )

            _emit_resample_branches(
                k, lambda: jnp.logical_not(same), static_in_hw,
                (ph_a, pw_a), resample_into_pk,
            )

            _blend_window_rows(
                pk_ref, src_shift,
                lambda rc, n: win_ref[pl.ds(rc, n), :],
                lambda rc, n, rows: win_ref.__setitem__(
                    (pl.ds(rc, n), slice(None)), rows
                ),
                dma_in.wait,
                dx, dy, out_h, out_w, (mh_a, mw_a), (MH, MW),
            )

            dma_out = pltpu.make_async_copy(win_ref, window_slice, sem_out)
            dma_out.start()
            dma_out.wait()

    return kernel


def _make_fused_kernel_v3_pipelined(
    n_batch: int, obj_pad_hw: Tuple[int, int], out_hw: Tuple[int, int],
    method: str, static_in_hw: Tuple[Tuple[int, int], ...] | None = None,
    shared_objs: bool = False,
    static_win: Tuple[Tuple[int, int], ...] | None = None,
):
    """Gen-3 fused kernel with double-buffered window/object DMAs.

    Grid iterates OBJECTS; a fori_loop walks the batch (consecutive
    iterations touch different canvases, so prefetching the next canvas's
    window + object overlaps the current table-build/resample/blend with
    no aliasing hazard; writeback b is waited at iteration b+1 and the
    epilogue waits the last, so all of a grid step's writebacks land
    before the next grid step reuses those canvases — z-order preserved).

    Same per-step machinery as :func:`_make_fused_kernel_v3` (identity
    fast path, chunked resample, row-bounded blend, optional per-object
    static-size branches — STATUS items 15-19); the double buffering
    additionally hides the ~1 us/step window writeback the grid-(B, N)
    kernel exposes (its next step may read an overlapping window on the
    SAME canvas, so it must wait; here consecutive steps touch different
    canvases).

    With ``shared_objs`` the premultiply is HOISTED (STATUS item 25): the
    bf16 premultiplied channel-stack depends only on the object pixels,
    so it is computed ONCE per grid step into a dedicated VMEM scratch
    (``prem_vmem``) instead of being recomputed by every one of the
    n_batch resample steps that follow.

    ``static_win`` (STATUS item 30): per-object window extents — each
    grid step's window DMAs (in and back) then move only object k's
    ``(WH_k, WW_k)`` window instead of the batch-max ``(MH, MW)``
    (descriptor count scales with window ROWS, so this also shrinks the
    serialized DMA-issue work, not just bytes). Requires meta built with
    the SAME ``static_win`` (per-object origin caps — _fused_v3_meta).
    The step COMPUTE is untouched: the blend may still touch scratch
    rows/cols beyond object k's window, but those never copy back (the
    writeback is the sized descriptor), and the masked source write +
    zero src_shift invariant already guarantee anything inside the
    window beyond the object blends as a no-op. All waits re-emit the
    same size their start did (both close over this grid step's k).
    """
    ph_a, pw_a = obj_pad_hw
    mh_a, mw_a = out_hw
    MH, MW = window_extents(out_hw)

    def kernel(meta_ref, canvas_ref, objs_ref, out_ref,
               win_ref, src_shift, pk_ref, tmp_ref, obj_vmem,
               *rest):
        if shared_objs:
            prem_vmem, sem_in, sem_out, sem_obj = rest
        else:
            prem_vmem = None
            sem_in, sem_out, sem_obj = rest
        del canvas_ref
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

        def window_dma(b, slot, to_vmem):
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)

            def make(wh: int, ww: int):
                window_slice = out_ref.at[b, pl.ds(ws_y, wh), pl.ds(ws_x, ww)]
                vmem = win_ref.at[slot, :wh, :ww]
                if to_vmem:
                    return pltpu.make_async_copy(
                        window_slice, vmem, sem_in.at[slot]
                    )
                return pltpu.make_async_copy(
                    vmem, window_slice, sem_out.at[slot]
                )

            if static_win is None:
                return make(MH, MW)
            # per-object window extents (STATUS item 30): exactly one
            # pl.when(k == i) branch emits the sized descriptor
            return _PerObjectCopy(k, static_win, make)

        def obj_dma(b, slot):
            return pltpu.make_async_copy(
                objs_ref.at[b, k], obj_vmem.at[slot], sem_obj.at[slot]
            )

        def step_compute(b, s: int):
            identity_into_pk(b, s)
            resample_branches(b, s)
            blend_window(b, s)

        def shared_fetch():
            # every canvas composites the same assets: ONE object copy per
            # grid step (object k of the [1, N, ...] tensor into slot 0),
            # reused across the whole batch loop — drops (n_batch - 1)
            # object DMAs per object row
            d0 = obj_dma(0, 0)
            d0.start()
            d0.wait()

            # premultiply hoist (STATUS item 25): prem depends only on the
            # object pixels, so it is identical for every canvas of this
            # grid step — compute it once here instead of n_batch times.
            # The scratch is written PACKED for this grid step's static
            # branch extents (channel c at rows [c*ph_k, (c+1)*ph_k)), so
            # the per-step load is ONE contiguous [4*ph_k, :pw_k] slice —
            # no per-step channel-concatenate copy.
            def write_prem(ph_k: int, pw_k: int):
                prem_vmem[: 4 * ph_k, :pw_k] = _premultiply2d(
                    obj_vmem[0, :, :ph_k, :pw_k].astype(jnp.int32),
                    ph_k, pw_k, centered_s8=INT8_DOTS,
                )

            if static_in_hw is None:
                write_prem(ph_a, pw_a)
            else:
                for i, (h_i, w_i) in enumerate(static_in_hw):
                    @pl.when(k == i)
                    def _(h_i=int(h_i), w_i=int(w_i)):
                        write_prem(
                            min(_round_up(max(h_i, 1), 8), ph_a),
                            min(_round_up(max(w_i, 1), 128), pw_a),
                        )

        def identity_into_pk(b, s: int):
            same = meta_ref[4, k, b] > 0
            valid = meta_ref[5, k, b] > 0
            obj_s = 0 if shared_objs else s

            @pl.when(valid & same)
            def _():
                _identity_pack_into(
                    pk_ref, obj_vmem[obj_s].astype(jnp.int32),
                    (ph_a, pw_a), (mh_a, mw_a),
                )

        def resample_branches(b, s: int):
            same = meta_ref[4, k, b] > 0
            valid = meta_ref[5, k, b] > 0
            in_h = meta_ref[6, k, b]
            in_w = meta_ref[7, k, b]
            out_h = meta_ref[8, k, b]
            out_w = meta_ref[9, k, b]

            obj_s = 0 if shared_objs else s

            def resample_into_pk(ph_k: int, pw_k: int):
                # chunked resample over this branch's static extents
                # (STATUS items 17/19); tables use the traced sizes. The
                # object DMA was waited in body() (or once per grid step
                # when shared), so loading is a plain VMEM read: the
                # hoisted prem scratch when shared (STATUS item 25), else
                # premultiply this step's object slot.
                if shared_objs:
                    def load_prem2d(ph_k=ph_k, pw_k=pw_k):
                        # packed by shared_fetch for exactly these extents
                        return prem_vmem[: 4 * ph_k, :pw_k]
                else:
                    def load_prem2d(ph_k=ph_k, pw_k=pw_k):
                        return _premultiply2d(
                            obj_vmem[obj_s, :, :ph_k, :pw_k].astype(
                                jnp.int32
                            ),
                            ph_k, pw_k,
                        )

                _resample_chunked_into(
                    pk_ref, tmp_ref, load_prem2d,
                    in_h, in_w, out_h, out_w, ph_k, pw_k, method,
                )

            not_same = valid & jnp.logical_not(same)
            _emit_resample_branches(
                k, lambda: not_same, static_in_hw,
                (ph_a, pw_a), resample_into_pk,
            )

        def blend_window(b, s: int):
            dx = meta_ref[2, k, b]
            dy = meta_ref[3, k, b]
            valid = meta_ref[5, k, b] > 0
            out_h = meta_ref[8, k, b]
            out_w = meta_ref[9, k, b]

            @pl.when(valid)
            def _():
                _blend_window_rows(
                    pk_ref, src_shift,
                    lambda rc, n: win_ref[s, pl.ds(rc, n), :],
                    lambda rc, n, rows: win_ref.__setitem__(
                        (s, pl.ds(rc, n), slice(None)), rows
                    ),
                    lambda: None,  # window DMA waited in the walk body
                    dx, dy, out_h, out_w, (mh_a, mw_a), (MH, MW),
                )

        _double_buffered_walk(
            n_batch, window_dma, step_compute,
            aux_dma=None if shared_objs else obj_dma,
            aux_wait_first=True,
            pre_loop=shared_fetch if shared_objs else None,
        )

    return kernel


def _pallas_fused_v3_impl(
    canvas_v: jnp.ndarray,  # [B, Hp, Wp] i32 packed (tile-aligned) — DONATED
    objs_p: jnp.ndarray,  # [B, N, 4, ph_a, pw_a] u8 planar
    meta: jnp.ndarray,  # [B, N, 10]
    out_hw: Tuple[int, int],
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
    interpret: bool = False,
    pipelined: bool = False,
    static_in_hw: Tuple[Tuple[int, int], ...] | None = None,
    static_windows: bool = False,
) -> jnp.ndarray:
    B, N = canvas_v.shape[0], objs_p.shape[1]
    ph_a, pw_a = objs_p.shape[3], objs_p.shape[4]
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))
    # SHARED OBJECT TENSOR: a leading objs dim of 1 against a B-batch
    # canvas means every canvas composites the SAME assets (the bench and
    # multi-ratio workloads) — the kernels then index object row 0 instead
    # of requiring B materialized copies (B x the object tensor in HBM;
    # ~3.7 GB at the 448-canvas headline batch).
    if objs_p.shape[0] not in (1, B):
        raise ValueError(
            f"objs_p batch {objs_p.shape[0]} must be 1 (shared) or {B}"
        )
    shared_objs = objs_p.shape[0] == 1 and B != 1
    if static_in_hw is not None and len(static_in_hw) != N:
        raise ValueError(
            f"static_in_hw has {len(static_in_hw)} entries for {N} objects"
        )
    if static_windows and not (pipelined and static_in_hw is not None):
        raise ValueError(
            "static_windows requires pipelined=True and static_in_hw "
            "(per-object window extents derive from the static asset sizes)"
        )
    if pipelined:
        grid = (N,)
        kernel = _make_fused_kernel_v3_pipelined(
            B, (ph_a, pw_a), (mh_a, mw_a), method, static_in_hw,
            shared_objs=shared_objs,
            static_win=(
                _static_window_extents(static_in_hw, (mh_a, mw_a))
                if static_windows else None
            ),
        )
        scratch = [
            pltpu.VMEM((2, MH, MW), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            # packed blend source (mh_128 tall: V chunks store 128 rows)
            pltpu.VMEM((_round_up(mh_a, 128), mw_a), jnp.int32),
            # H-pass intermediate, channel-stacked (chunked resample);
            # stored centered-s8 on the s8 dot path (STATUS item 29)
            pltpu.VMEM((4 * ph_a, mw_a),
                       jnp.int8 if INT8_DOTS else jnp.bfloat16),
            # shared objects use only slot 0 — halve the object VMEM
            pltpu.VMEM((1 if shared_objs else 2, 4, ph_a, pw_a), jnp.uint8),
        ]
        if shared_objs:
            # hoisted premultiply, once per grid step (STATUS item 25);
            # the s8 dot path stores it already re-centered as int8
            # (STATUS item 28) — halves the scratch and the per-step load
            scratch.append(pltpu.VMEM(
                (4 * ph_a, pw_a),
                jnp.int8 if INT8_DOTS else jnp.bfloat16,
            ))
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        grid = (B, N)
        kernel = _make_fused_kernel_v3(
            (ph_a, pw_a), (mh_a, mw_a), method, static_in_hw,
            shared_objs=shared_objs,
        )
        scratch = [
            pltpu.VMEM((MH, MW), jnp.int32),
            pltpu.VMEM((2 * MH, mw_a), jnp.int32),
            # packed blend source (mh_128 tall: V chunks store 128 rows)
            pltpu.VMEM((_round_up(mh_a, 128), mw_a), jnp.int32),
            # H-pass intermediate, channel-stacked (chunked resample);
            # stored centered-s8 on the s8 dot path (STATUS item 29)
            pltpu.VMEM((4 * ph_a, mw_a),
                       jnp.int8 if INT8_DOTS else jnp.bfloat16),
            pltpu.VMEM((4, ph_a, pw_a), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    out_v = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v, objs_p)
    h_c, w_c = out_hw
    return out_v[:, :h_c, :w_c]


_FUSED3_STATICS = (
    "out_hw", "out_max_hw", "method", "interpret", "pipelined",
    "static_in_hw", "static_windows",
)
_fused_v3_donated = functools.partial(
    jax.jit, static_argnames=_FUSED3_STATICS, donate_argnums=(0,)
)(_pallas_fused_v3_impl)
_fused_v3_plain = functools.partial(
    jax.jit, static_argnames=_FUSED3_STATICS
)(_pallas_fused_v3_impl)


def _pallas_fused_v3(canvas_v, objs_p, meta, out_hw, out_max_hw, method,
                     interpret=False, pipelined=False, static_in_hw=None,
                     static_windows=False):
    identity_crop = (canvas_v.shape[1], canvas_v.shape[2]) == tuple(out_hw)
    fn = _fused_v3_donated if identity_crop else _fused_v3_plain
    return fn(canvas_v, objs_p, meta, tuple(out_hw), tuple(out_max_hw),
              method, interpret, pipelined, static_in_hw, static_windows)


def fused_canvas_pad_hw(
    canvas_hw: Tuple[int, int], out_max_hw: Tuple[int, int]
) -> Tuple[int, int]:
    """Padded canvas extent the fused kernels render into (tile + window
    alignment). With ``padded_out`` the kernel returns this full plane and
    the host crops by VIEW (free)."""
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    return (
        max(_round_up(canvas_hw[0], 8), MH),
        max(_round_up(canvas_hw[1], 128), MW),
    )


def planarize_objects(objs: jnp.ndarray) -> jnp.ndarray:
    """[B, N, ph, pw, 4] u8 -> tile-aligned planar [B, N, 4, ph_a, pw_a].

    The engine-side ingest transform for :func:`composite_batch_fused_v3`:
    object assets are planarized ONCE per bundle (serving caches them),
    so the per-render producer is meta-only.
    """
    ph, pw = objs.shape[2], objs.shape[3]
    ph_a = _round_up(ph, 8)
    pw_a = _round_up(pw, 128)
    return jnp.transpose(
        jnp.pad(objs, ((0, 0), (0, 0), (0, ph_a - ph), (0, pw_a - pw), (0, 0))),
        (0, 1, 4, 2, 3),
    )


def _fused_v3_meta(obj_hw, boxes, canvas_hw, pad_hw, window_hw,
                   static_win=None):
    """Clamped window meta [B, N, 10] shared by the v3 producers: the
    shared 6-column window meta plus per-object source and target sizes
    (the gen-3 kernel builds its coefficient tables in-kernel from these,
    STATUS item 12).

    Target sizes are CLAMPED to the kernel's envelope (out_max, recovered
    from the window extents — every caller passes
    ``window_extents((mh_a, mw_a))`` with tile-aligned extents, whose
    inverse is exact): the chunked resample stores ``ceil(out/128)``
    128-wide chunks into scratch sized by the envelope, so an
    out-of-envelope box (boxes are traced data — the VLM chooses them)
    must degrade to a cropped-scale render like gen-2 did, not write past
    VMEM scratch and silently corrupt neighbouring objects' tables.

    ``static_win`` (STATUS item 30): per-object window extents for the
    static-window kernel. Origin caps and target-size clamps then apply
    PER OBJECT (cap ``hp - WH_i`` instead of ``hp - MH``), so each
    window stays inside the padded plane at its own size; the same
    degrade-to-cropped-scale semantics hold at the tighter per-object
    envelope (downscale-only workloads never hit either clamp)."""
    hp, wp = pad_hw
    MH, MW = window_hw
    if static_win is None:
        cap_h, cap_w = MH, MW
    else:
        # [N] per-object window extents; broadcast against the [B, N] boxes
        cap_h = jnp.asarray([v[0] for v in static_win], jnp.int32)[None, :]
        cap_w = jnp.asarray([v[1] for v in static_win], jnp.int32)[None, :]
    w = jnp.minimum(
        jnp.maximum(1, boxes[..., 2] - boxes[..., 0]), cap_w - 128
    )
    h = jnp.minimum(
        jnp.maximum(1, boxes[..., 3] - boxes[..., 1]), cap_h - 8
    )
    same = (w == obj_hw[..., 1]) & (h == obj_hw[..., 0])
    meta6 = _window_meta6(
        boxes, canvas_hw, origin_cap=(hp - cap_h, wp - cap_w), same=same
    )
    sizes = jnp.stack([obj_hw[..., 0], obj_hw[..., 1], h, w], axis=-1)
    return jnp.concatenate([meta6, sizes.astype(jnp.int32)], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("out_max_hw", "canvas_hw", "static_win")
)
def _fused_v3_producer(canvases, objs, obj_hw, boxes, out_max_hw, canvas_hw,
                       static_win=None):
    """Planar objects + clamped meta (with per-object sizes) for fused v3.

    No tables, no resample dots — only the object transpose to planar
    (skipped when the caller already supplies pre-planarized assets), the
    canvas pack (skipped when the caller already supplies a packed canvas),
    and the meta build. ``canvases`` is either [B, H, W, 4] u8 or an
    already-packed [B, H, W] i32 plane (``canvas_hw`` disambiguates);
    ``objs`` is either [B, N, ph, pw, 4] u8 or planar [B, N, 4, ph_a, pw_a].
    """
    h_c, w_c = canvas_hw
    planar_in = objs.shape[4] != 4  # planar trailing dim is pw_a (%128)
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))
    hp, wp = fused_canvas_pad_hw(canvas_hw, out_max_hw)

    objs_p = objs if planar_in else planarize_objects(objs)
    meta = _fused_v3_meta(
        obj_hw, boxes, canvas_hw, (hp, wp), (MH, MW), static_win=static_win
    )

    if canvases.dtype == jnp.uint8:
        canvas_v = jax.lax.bitcast_convert_type(canvases, jnp.int32)
    else:
        canvas_v = canvases
    canvas_v = jnp.pad(canvas_v, ((0, 0), (0, hp - h_c), (0, wp - w_c)))
    return canvas_v, objs_p, meta


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_max_hw", "canvas_hw", "batch", "bg_packed", "static_win"
    ),
)
def _fused_v3_producer_fill(
    objs, obj_hw, boxes, out_max_hw, canvas_hw, batch, bg_packed,
    static_win=None,
):
    """Fill-background producer: synthesizes the padded packed canvas on
    device (one write-only fill — profile-attributed ~1.6 ms/batch cheaper
    than re-padding an uploaded canvas at 1080p batch 64). This is what a
    solid-background render does anyway (reference fill_solid)."""
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))
    hp, wp = fused_canvas_pad_hw(canvas_hw, out_max_hw)
    planar_in = objs.shape[4] != 4
    objs_p = objs if planar_in else planarize_objects(objs)
    meta = _fused_v3_meta(
        obj_hw, boxes, canvas_hw, (hp, wp), (MH, MW), static_win=static_win
    )
    canvas_v = jnp.full((batch, hp, wp), jnp.int32(bg_packed), jnp.int32)
    return canvas_v, objs_p, meta


def composite_batch_fused_v3(
    canvases: jnp.ndarray | None,  # [B,H,W,4] u8, [B,H,W] i32 packed, or None
    objs: jnp.ndarray,  # [B, N, ph, pw, 4] u8, or planar [B, N, 4, ph_a, pw_a]
    obj_hw: jnp.ndarray,  # [B, N, 2] (h, w)
    boxes: jnp.ndarray,  # [B, N, 4]
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
    packed_out: bool = False,
    pipelined: bool = False,
    bg_rgba: Tuple[int, int, int, int] | None = None,
    canvas_hw: Tuple[int, int] | None = None,
    padded_out: bool = False,
    static_obj_hw: Tuple[Tuple[int, int], ...] | None = None,
    static_windows: bool | None = None,
) -> jnp.ndarray:
    """Fused resample+blend gen-3: tables built in-kernel (see
    _make_fused_kernel_v3). Engine-style calling conventions, each one
    skipping a full-canvas pass: a packed-u32 canvas input (no u8->u32
    repack), pre-planarized objects (no per-call transpose), a solid
    ``bg_rgba`` background synthesized on device (``canvases=None``,
    ``canvas_hw`` required — no canvas upload OR pad copy; the fresh
    padded buffer is donated straight into the kernel), and ``padded_out``
    (with ``packed_out``) returning the full padded plane so the host
    crops by VIEW. ``pipelined`` double-buffers window/object DMAs across
    canvases (grid over objects; measured neutral).

    Numerics: traced-table envelope (the in-kernel f32 table build can
    differ from the XLA builder by 1 quantized ulp; <= 2/255 vs PIL).
    """
    if canvases is None:
        if bg_rgba is None or canvas_hw is None:
            raise ValueError("canvases=None requires bg_rgba and canvas_hw")
        h_c, w_c = canvas_hw
    else:
        h_c, w_c = canvases.shape[1], canvases.shape[2]
    if padded_out and not packed_out:
        raise ValueError("padded_out requires packed_out")
    if objs.shape[4] != 4:  # pre-planarized [B, N, 4, ph_a, pw_a]
        ph, pw = objs.shape[3], objs.shape[4]
    else:
        ph, pw = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (ph, pw)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    if static_windows is None:
        static_windows = STATIC_WINDOWS
    use_sw = (
        bool(static_windows) and pipelined and static_obj_hw is not None
    )
    static_win = (
        _static_window_extents(static_obj_hw, (mh_a, mw_a))
        if use_sw else None
    )
    if canvases is None:
        bg_packed = pack_rgba_scalar(bg_rgba)
        # batch from BOXES, not objs: a shared [1, N, ...] object tensor
        # (STATUS item 24) against B-batch boxes must render B canvases,
        # not silently drop boxes[1:] behind a 1-canvas plane
        canvas_v, objs_p, meta = _fused_v3_producer_fill(
            objs, obj_hw, boxes, (mh_a, mw_a), (h_c, w_c), boxes.shape[0],
            bg_packed, static_win=static_win,
        )
    else:
        canvas_v, objs_p, meta = _fused_v3_producer(
            canvases, objs, obj_hw, boxes, (mh_a, mw_a), (h_c, w_c),
            static_win=static_win,
        )
    out_hw = (
        (canvas_v.shape[1], canvas_v.shape[2]) if padded_out else (h_c, w_c)
    )
    out_v = _pallas_fused_v3(
        canvas_v, objs_p, meta, out_hw, (mh_a, mw_a), method, interpret,
        pipelined, static_obj_hw, static_windows=use_sw,
    )
    if packed_out:
        return out_v
    return jax.lax.bitcast_convert_type(out_v, jnp.uint8)


def pack_rgba_scalar(bg_rgba: Tuple[int, int, int, int]) -> int:
    """(r, g, b, a) -> little-endian packed RGBA as a signed int32 pattern."""
    r, g, b, a = (int(v) & 255 for v in bg_rgba)
    packed = r | (g << 8) | (b << 16) | (a << 24)
    return packed - (1 << 32) if packed >= 1 << 31 else packed


def render_solid_fused_v3_program(
    objs_p: jnp.ndarray,  # [B, N, 4, ph_a, pw_a] u8 planar (planarize_objects)
    obj_hw: jnp.ndarray,  # [B, N, 2]
    boxes: jnp.ndarray,  # [B, N, 4]
    canvas_hw: Tuple[int, int],
    bg_packed: int,  # pack_rgba_scalar(bg_rgba) — static
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
    pipelined: bool = False,
    static_obj_hw: Tuple[Tuple[int, int], ...] | None = None,
    static_windows: bool | None = None,
) -> jnp.ndarray:
    """ONE-program solid-background batch renderer (traceable, not jitted):
    on-device background fill + the gen-3 fused kernel, returning the
    padded packed-u32 plane (crop with a host byte view —
    ``packed_to_u8_np(out)[:, :H, :W]``).

    Embed in your own jit together with any run-level stats — one dispatch
    per step. Fusing the fill into the kernel's program removed ~2.6 ms of
    per-batch host dispatch gap at 1080p batch 64 (8312 -> 9388
    canvases/sec); the old single-program pathology (STATUS item 3) was
    specific to the table-building producer, which gen-3 no longer has.

    ``static_obj_hw``: per-object static (h, w) asset sizes — MUST match
    ``obj_hw`` row-for-row on every batch element (asset sizes are fixed
    per bundle). Specializes the kernel's resample dots to each object's
    real padded extents (STATUS item 19); bitwise-identical output.

    ``objs_p`` may carry a leading dim of 1 against a B-batch ``boxes``:
    every canvas then composites the SAME assets from one copy (STATUS
    item 24 — the bench/multi-ratio workloads save B x the object tensor
    in HBM); bitwise-identical to passing B copies.

    ``static_windows`` (STATUS item 30): per-object window DMA extents
    (requires ``pipelined`` + ``static_obj_hw``); None resolves to the
    module default ``STATIC_WINDOWS``. Bitwise-identical output.
    """
    if out_max_hw is None:
        out_max_hw = (objs_p.shape[3], objs_p.shape[4])
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    hp, wp = fused_canvas_pad_hw(canvas_hw, (mh_a, mw_a))
    if static_windows is None:
        static_windows = STATIC_WINDOWS
    use_sw = bool(static_windows) and pipelined and static_obj_hw is not None
    meta = _fused_v3_meta(
        obj_hw, boxes, canvas_hw, (hp, wp), (MH, MW),
        static_win=(
            _static_window_extents(static_obj_hw, (mh_a, mw_a))
            if use_sw else None
        ),
    )
    canvas_v = jnp.full(
        (boxes.shape[0], hp, wp), jnp.int32(bg_packed), jnp.int32
    )
    return _pallas_fused_v3_impl(
        canvas_v, objs_p, meta, (hp, wp), (mh_a, mw_a), method, interpret,
        pipelined, static_in_hw=static_obj_hw, static_windows=use_sw,
    )


def _make_restore_kernel(out_hw: Tuple[int, int], bg_packed: int,
                         grid: Tuple[int, int]):
    """Grid-(B, N) window restore: DMA a solid block over each window a
    previous render touched. The fused kernels only ever modify pixels
    inside their (MH, MW) windows (the writeback copies the rest of the
    window back unchanged), so restoring those windows on a donated
    output plane returns it to the all-solid state without re-writing the
    full plane (STATUS item 20: 2.1 GB fill -> ~0.45 GB of window DMAs at
    1080p batch 256)."""
    MH, MW = window_extents(out_hw)
    n_batch, n_obj = grid
    total = n_batch * n_obj

    def kernel(meta_ref, canvas_ref, out_ref, win_ref, sem):
        del canvas_ref
        b = pl.program_id(0)
        k = pl.program_id(1)
        li = b * n_obj + k

        @pl.when(li == 0)
        def _():
            win_ref[...] = jnp.full((MH, MW), jnp.int32(bg_packed), jnp.int32)

        # One same-size DMA per step, started unconditionally (meta window
        # origins are always in-bounds, and erasing an extra window is
        # harmless — the subsequent render redraws every valid object; a
        # pair of in-flight restores may overlap, but both write the same
        # solid bytes) and waited one step LATE on alternating semaphores,
        # so consecutive restores overlap. A wait only needs the matching
        # semaphore and size (all copies are window-sized); the
        # descriptor's addresses are this step's.
        def dma(slot):
            ws_x = pl.multiple_of(meta_ref[0, k, b], 128)
            ws_y = pl.multiple_of(meta_ref[1, k, b], 8)
            return pltpu.make_async_copy(
                win_ref,
                out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)],
                sem.at[slot],
            )

        s = jax.lax.rem(li, 2)

        @pl.when(li >= 2)
        def _():
            dma(s).wait()  # the copy started two steps ago on this slot

        dma(s).start()

        if total >= 2:
            @pl.when(li == total - 1)
            def _():
                dma(s).wait()
                dma(1 - s).wait()
        else:
            dma(s).wait()

    return kernel


def _make_restore_kernel_static(
    bg_packed: int, grid: Tuple[int, int],
    static_win: Tuple[Tuple[int, int], ...], pad_hw: Tuple[int, int],
):
    """Per-object static-size window restore (STATUS item 22).

    Same idea as :func:`_make_restore_kernel`, but each object's restore
    DMA is sized to ITS window extents (derived from the static asset
    sizes — a downscale-only render never touches more than the asset
    extent) instead of the batch-max window, roughly halving restore
    bytes on mixed-size bundles. The grid iterates (object, batch) so
    consecutive steps share the object index — and therefore the DMA
    size — which keeps the lagged-semaphore overlap valid: a wait only
    needs the matching semaphore and size, and two steps ago is the same
    object two canvases back (the first two canvases of each object row
    wait the PREVIOUS object's size, a static branch). Requires
    n_batch >= 2 (callers fall back to the uniform kernel otherwise).
    """
    n_obj, n_batch = grid
    hp, wp = pad_hw
    mh = max(wh for wh, _ in static_win)
    mw = max(ww for _, ww in static_win)

    def kernel(meta_ref, canvas_ref, out_ref, win_ref, sem):
        del canvas_ref
        k = pl.program_id(0)
        b = pl.program_id(1)
        li = k * n_batch + b

        @pl.when(li == 0)
        def _():
            win_ref[...] = jnp.full((mh, mw), jnp.int32(bg_packed), jnp.int32)

        s = jax.lax.rem(li, 2)

        def dma(slot, i: int):
            # descriptor sized to object i's window; origins re-clamped so
            # a boundary wait built with the PREVIOUS object's (possibly
            # larger) extents stays in bounds
            wh, ww = static_win[i]
            rs_x = pl.multiple_of(
                jnp.minimum(meta_ref[0, k, b], wp - ww), 128
            )
            rs_y = pl.multiple_of(jnp.minimum(meta_ref[1, k, b], hp - wh), 8)
            return pltpu.make_async_copy(
                win_ref.at[:wh, :ww],
                out_ref.at[b, pl.ds(rs_y, wh), pl.ds(rs_x, ww)],
                sem.at[slot],
            )

        for i in range(n_obj):
            @pl.when(k == i)
            def _(i=i):
                @pl.when(b >= 2)
                def _():
                    dma(s, i).wait()  # copy from (i, b-2): same size
                if i > 0:
                    @pl.when(b < 2)
                    def _():
                        dma(s, i - 1).wait()  # tail of the previous row
                dma(s, i).start()
                if i == n_obj - 1:
                    @pl.when(b == n_batch - 1)
                    def _():
                        dma(s, i).wait()
                        dma(1 - s, i).wait()  # (i, b-1): n_batch >= 2

    return kernel


def _restore_meta_static(boxes, canvas_hw, pad_hw, static_win):
    """[B, N, 2] window origins for the static restore kernel: per-object
    extents, same clamped-origin convention as :func:`_fused_v3_meta`."""
    h_c, w_c = canvas_hw
    hp, wp = pad_hw
    wh = jnp.asarray([v[0] for v in static_win], jnp.int32)
    ww = jnp.asarray([v[1] for v in static_win], jnp.int32)
    x1c = jnp.clip(boxes[..., 0], 0, w_c)
    y1c = jnp.clip(boxes[..., 1], 0, h_c)
    rs_x = jnp.minimum((x1c // 128) * 128, (wp - ww)[None, :])
    rs_y = jnp.minimum((y1c // 8) * 8, (hp - wh)[None, :])
    return jnp.stack([rs_x, rs_y], axis=-1).astype(jnp.int32)


def _pallas_restore_windows(canvas_v, meta, out_max_hw, bg_packed: int,
                            interpret: bool = False,
                            static_win: Tuple[Tuple[int, int], ...] | None = None):
    """Restore every window ``meta`` describes to the solid background on
    a DONATED packed plane (see _make_restore_kernel). With ``static_win``
    (per-object window extents; requires batch >= 2 and ``meta`` built by
    :func:`_restore_meta_static`), each object's DMA shrinks to its own
    window (STATUS item 22)."""
    B, N = meta.shape[0], meta.shape[1]
    if static_win is not None and B >= 2:
        mh = max(wh for wh, _ in static_win)
        mw = max(ww for _, ww in static_win)
        kernel = _make_restore_kernel_static(
            bg_packed, (N, B), static_win, canvas_v.shape[1:]
        )
        grid = (N, B)
        scratch = pltpu.VMEM((mh, mw), jnp.int32)
    else:
        MH, MW = window_extents(out_max_hw)
        kernel = _make_restore_kernel(out_max_hw, bg_packed, (B, N))
        grid = (B, N)
        scratch = pltpu.VMEM((MH, MW), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            scratch,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
        grid_spec=grid_spec,
        # index 0 is the scalar-prefetch meta; the canvas plane is 1
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.transpose(meta, (2, 1, 0)), canvas_v)


def render_solid_fused_v3_reuse_program(
    prev_v: jnp.ndarray,  # [B, hp, wp] i32: the PREVIOUS render's plane
    prev_boxes: jnp.ndarray,  # [B, N, 4] boxes that render was made with
    objs_p: jnp.ndarray,  # [B, N, 4, ph_a, pw_a] u8 planar
    obj_hw: jnp.ndarray,  # [B, N, 2]
    boxes: jnp.ndarray,  # [B, N, 4]
    canvas_hw: Tuple[int, int],
    bg_packed: int,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
    static_obj_hw: Tuple[Tuple[int, int], ...] | None = None,
    pipelined: bool = False,
    static_windows: bool | None = None,
) -> jnp.ndarray:
    """Framebuffer-reuse sibling of :func:`render_solid_fused_v3_program`
    (STATUS item 20): instead of synthesizing a fresh solid plane (a full
    HBM-bandwidth write — ~3 ms for 2.1 GB at 1080p batch 256), restore
    only the windows the PREVIOUS render touched on its (donated) output
    plane, then compose the new boxes. The caller threads the previous
    output and its boxes back in (ping-pong two buffers if the host still
    reads the older one). First render of a buffer: use the regular
    program. ``prev_v`` must come from a render with the SAME bg_packed,
    canvas_hw, out_max_hw, and object set.

    With ``static_obj_hw`` (and batch >= 2) the restore DMAs shrink to
    per-object window extents (STATUS item 22). Extra contract beyond the
    render kernel's: the static sizes must also upper-bound the OUT sizes
    ``prev_boxes`` rendered at — true for every downscale-only workload
    (the flex solver's scale = min(1.0, fit), identity placements, and
    all bench/sweep/serving paths). Callers with upscaling boxes must
    pass ``static_obj_hw=None``.
    """
    if out_max_hw is None:
        out_max_hw = (objs_p.shape[3], objs_p.shape[4])
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    hp, wp = fused_canvas_pad_hw(canvas_hw, (mh_a, mw_a))
    if tuple(prev_v.shape[1:]) != (hp, wp):
        raise ValueError(
            f"prev_v plane {prev_v.shape[1:]} != expected {(hp, wp)}"
        )
    if static_windows is None:
        static_windows = STATIC_WINDOWS
    use_sw = (
        bool(static_windows) and pipelined and static_obj_hw is not None
    )
    meta = _fused_v3_meta(
        obj_hw, boxes, canvas_hw, (hp, wp), (MH, MW),
        static_win=(
            _static_window_extents(static_obj_hw, (mh_a, mw_a))
            if use_sw else None
        ),
    )
    if static_obj_hw is not None and prev_v.shape[0] >= 2:
        static_win = _static_window_extents(static_obj_hw, (mh_a, mw_a))
        prev_meta = _restore_meta_static(
            prev_boxes, canvas_hw, (hp, wp), static_win
        )
        canvas_v = _pallas_restore_windows(
            prev_v, prev_meta, (mh_a, mw_a), bg_packed, interpret,
            static_win=static_win,
        )
    else:
        prev_meta = _fused_v3_meta(
            obj_hw, prev_boxes, canvas_hw, (hp, wp), (MH, MW)
        )
        canvas_v = _pallas_restore_windows(
            prev_v, prev_meta, (mh_a, mw_a), bg_packed, interpret
        )
    return _pallas_fused_v3_impl(
        canvas_v, objs_p, meta, (hp, wp), (mh_a, mw_a), method, interpret,
        pipelined, static_in_hw=static_obj_hw, static_windows=use_sw,
    )


def render_gradient_fused_v3_program(
    objs_p: jnp.ndarray,  # [B, N, 4, ph_a, pw_a] u8 planar
    obj_hw: jnp.ndarray,  # [B, N, 2]
    boxes: jnp.ndarray,  # [B, N, 4]
    canvas_hw: Tuple[int, int],
    c1: jnp.ndarray,  # [B, 3] u8 gradient start color (per canvas)
    c2: jnp.ndarray,  # [B, 3] u8 gradient end color
    horizontal: bool,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
    static_obj_hw: Tuple[Tuple[int, int], ...] | None = None,
) -> jnp.ndarray:
    """Gradient-background sibling of :func:`render_solid_fused_v3_program`:
    the linear c1->c2 ramp (reference fill_gradient semantics — f32 lerp
    over the true canvas extent, truncating u8 cast; see
    ops/background.gradient_canvas) is synthesized directly as the packed
    plane, then the gen-3 fused kernel composes in the same program.
    The pad region extends the ramp clamped at t=1 (cropped by the host
    view). Returns the padded packed-u32 plane.
    """
    if out_max_hw is None:
        out_max_hw = (objs_p.shape[3], objs_p.shape[4])
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    H, W = canvas_hw
    hp, wp = fused_canvas_pad_hw(canvas_hw, (mh_a, mw_a))
    meta = _fused_v3_meta(obj_hw, boxes, canvas_hw, (hp, wp), (MH, MW))

    n = wp if horizontal else hp
    limit = W if horizontal else H
    # f64 weights on host, like the reference loop (and gradient_canvas):
    # an f32 (1.0 - t) loses round-to-even ties by one ulp, flipping the
    # truncating u8 cast on ~0.03% of (extent, color) rows
    t64 = np.clip(np.arange(n) / max(1, limit - 1), 0.0, 1.0)
    t = jnp.asarray(t64.astype(np.float32))
    w1 = jnp.asarray((1.0 - t64).astype(np.float32))
    ramp = (
        w1[None, :, None] * c1.astype(jnp.float32)[:, None, :]
        + t[None, :, None] * c2.astype(jnp.float32)[:, None, :]
    )
    rgb = ramp.astype(jnp.uint8).astype(jnp.int32)  # truncation, as reference
    packed = (
        rgb[..., 0] | (rgb[..., 1] << 8) | (rgb[..., 2] << 16)
        | jnp.int32(-16777216)  # alpha 255 << 24 as a signed bit pattern
    )
    if horizontal:
        canvas_v = jnp.broadcast_to(packed[:, None, :], (packed.shape[0], hp, wp))
    else:
        canvas_v = jnp.broadcast_to(packed[:, :, None], (packed.shape[0], hp, wp))
    return _pallas_fused_v3_impl(
        canvas_v, objs_p, meta, (hp, wp), (mh_a, mw_a), method, interpret,
        static_in_hw=static_obj_hw,
    )


def fused_v2_host_tables_prep(
    obj_hw: np.ndarray,  # [B, N, 2] (h, w) host ints
    boxes: np.ndarray,  # [B, N, 4] host ints (tables need concrete sizes)
    canvas_hw: Tuple[int, int],
    obj_pad_hw: Tuple[int, int],
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
):
    """Host side of the bit-exact fused compose: Pillow-exact coefficient
    tables (build_coeffs_host, lru-cached per size) + clamped window meta.
    Returns numpy (kh [B,N,mw_a,pw_a], kv_t [B,N,ph_a,mh_128], meta)."""
    from .resize import build_coeffs_host

    obj_hw = np.asarray(obj_hw, np.int64)
    boxes = np.asarray(boxes, np.int64)
    B, N = boxes.shape[0], boxes.shape[1]
    h_c, w_c = canvas_hw
    ph, pw = obj_pad_hw
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    mh_128 = _round_up(mh_a, 128)
    ph_a = _round_up(ph, 8)
    pw_a = _round_up(pw, 128)
    MH, MW = window_extents((mh_a, mw_a))
    hp = max(_round_up(h_c, 8), MH)
    wp = max(_round_up(w_c, 128), MW)

    kh = np.zeros((B, N, mw_a, pw_a), np.int32)
    kv_t = np.zeros((B, N, ph_a, mh_128), np.int32)
    meta = np.zeros((B, N, 6), np.int32)
    for b in range(B):
        for k in range(N):
            x1, y1, x2, y2 = (int(v) for v in boxes[b, k])
            w_t, h_t = max(1, x2 - x1), max(1, y2 - y1)
            oh, ow = int(obj_hw[b, k, 0]), int(obj_hw[b, k, 1])
            kh[b, k, :, :pw] = build_coeffs_host(ow, w_t, pw, mw_a, method)
            kv_t[b, k, :ph, :mh_a] = build_coeffs_host(
                oh, h_t, ph, mh_a, method
            ).T
            drop = x1 < 0 or y1 < 0 or x1 >= w_c or y1 >= h_c
            x1c = min(max(x1, 0), w_c)
            y1c = min(max(y1, 0), h_c)
            ws_x = min((x1c // 128) * 128, wp - MW)
            ws_y = min((y1c // 8) * 8, hp - MH)
            meta[b, k] = (
                ws_x, ws_y, x1c - ws_x, y1c - ws_y,
                int(w_t == ow and h_t == oh), int(not drop),
            )
    return kh, kv_t, meta


@functools.partial(
    jax.jit, static_argnames=("out_hw", "out_max_hw", "interpret")
)
def _fused_v2_exact_apply(
    canvases, objs_or_planar, kh, kv_t, meta, out_hw, out_max_hw,
    interpret=False,
):
    """Device side of the bit-exact fused compose, ONE program: canvas
    pack+pad, object planarize (skipped for pre-planarized assets), and
    the gen-2 kernel. Inputs may be device-resident (engine case)."""
    h_c, w_c = out_hw
    mh_a, mw_a = out_max_hw
    MH, MW = window_extents((mh_a, mw_a))
    hp = max(_round_up(h_c, 8), MH)
    wp = max(_round_up(w_c, 128), MW)
    if canvases.dtype == jnp.uint8:
        canvas_v = jax.lax.bitcast_convert_type(canvases, jnp.int32)
    else:
        canvas_v = canvases
    canvas_v = jnp.pad(canvas_v, ((0, 0), (0, hp - h_c), (0, wp - w_c)))
    objs_p = (
        objs_or_planar
        if objs_or_planar.shape[4] != 4
        else planarize_objects(objs_or_planar)
    )
    out_v = _pallas_fused_v2_impl(
        canvas_v, objs_p, kh, kv_t, meta, (h_c, w_c), (mh_a, mw_a), interpret
    )
    return jax.lax.bitcast_convert_type(out_v, jnp.uint8)


def composite_batch_fused_v2_host_tables(
    canvases,  # [B, H, W, 4] u8 (or [B, H, W] i32 packed) — may be on device
    objs,  # [B, N, ph, pw, 4] u8 or planar [B, N, 4, ph_a, pw_a]
    obj_hw: np.ndarray,  # [B, N, 2] (h, w) HOST ints
    boxes: np.ndarray,  # [B, N, 4] HOST ints
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
) -> jnp.ndarray:
    """BIT-EXACT fused compose: the gen-2 kernel fed host-exact tables.

    The gen-2 kernel's 3-limb MXU dots are exact integer arithmetic given
    int32 tables; with Pillow-exact host tables (build_coeffs_host) the
    whole path reproduces PIL bit-for-bit — at fused-kernel speed — for
    coefficient rows up to ~256 live taps (see the module header; extreme
    >43x downscales exceed the f32 limb accumulators' exact range and
    belong on ops.compose's chunked-exact wide path, which the engine
    selects automatically). Boxes must be host data (the
    orchestrator/serving case); canvases/objects may stay
    device-resident. Returns u8 [B, H, W, 4].
    """
    h_c, w_c = canvases.shape[1], canvases.shape[2]
    if objs.shape[4] != 4:  # pre-planarized
        ph, pw = objs.shape[3], objs.shape[4]
    else:
        ph, pw = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (ph, pw)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    kh, kv_t, meta = fused_v2_host_tables_prep(
        obj_hw, boxes, (h_c, w_c), (ph, pw), (mh_a, mw_a), method
    )
    return _fused_v2_exact_apply(
        canvases, objs, jnp.asarray(kh), jnp.asarray(kv_t), jnp.asarray(meta),
        (h_c, w_c), (mh_a, mw_a), interpret,
    )


def composite_batch_pallas_host_tables(
    canvases: np.ndarray,
    objs: np.ndarray,
    obj_hw: np.ndarray,
    boxes: np.ndarray,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
    interpret: bool = False,
):
    """Convenience wrapper building bit-exact host tables for concrete boxes."""
    from .resize import build_coeffs_host

    B, N = objs.shape[0], objs.shape[1]
    pad_h, pad_w = objs.shape[2], objs.shape[3]
    if out_max_hw is None:
        out_max_hw = (pad_h, pad_w)
    kh = np.zeros((B, N, out_max_hw[1], pad_w), np.int32)
    kv = np.zeros((B, N, out_max_hw[0], pad_h), np.int32)
    for b in range(B):
        for k in range(N):
            x1, y1, x2, y2 = (int(v) for v in boxes[b, k])
            w_t, h_t = max(1, x2 - x1), max(1, y2 - y1)
            oh, ow = int(obj_hw[b, k, 0]), int(obj_hw[b, k, 1])
            kh[b, k] = build_coeffs_host(ow, w_t, pad_w, out_max_hw[1], method)
            kv[b, k] = build_coeffs_host(oh, h_t, pad_h, out_max_hw[0], method)
    return composite_batch_pallas(
        jnp.asarray(canvases),
        jnp.asarray(objs),
        jnp.asarray(np.asarray(obj_hw, np.int32)),
        jnp.asarray(np.asarray(boxes, np.int32)),
        jnp.asarray(kh),
        jnp.asarray(kv),
        interpret=interpret,
    )
