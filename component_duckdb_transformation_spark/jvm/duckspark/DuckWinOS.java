package duckspark;

import org.apache.spark.sql.api.java.UDF5;
import scala.collection.Iterator;
import scala.collection.Seq;
import java.util.HashMap;
import java.util.HashSet;
import java.util.LinkedHashMap;
import java.util.LinkedList;
import java.util.Map;

/**
 * Streaming order-statistics window core: O(log^2 frame) per row
 * running/moving mad(), quantile_cont(), quantile_disc() and O(d)-per-
 * row entropy() over RUNNING (ROWS/RANGE UNBOUNDED PRECEDING ..
 * CURRENT ROW), bounded trailing (ROWS a PRECEDING .. [b PRECEDING |
 * CURRENT ROW]) and (r13) lookahead (ROWS [a|UNBOUNDED] PRECEDING ..
 * b FOLLOWING) frames — the compiled replacement for the
 * O(frame)-per-row collect_list folds (dialect.py _mad_window_template
 * / _quantile_cont_fold_sql / _quantile_disc_fold_sql /
 * _entropy_fold_sql) on those shapes. DuckDB's windowed aggregate
 * executor solves the same problem with a segment tree; here an
 * order-statistic treap (rank/select multiset in Double.compare order)
 * plus a value-count map are maintained incrementally as WindowExec
 * streams partition rows in order.
 *
 * FOLLOWING frames stream WITHOUT lookahead machinery: the dialect
 * shifts the INPUT — vals carries lead(x, b) so the row-i trailing
 * multiset of width a+b+1 is exactly frame [i-a, i+b]; at rn=1 vals
 * seeds the first b+1 values (lead 0..b), and past the partition end
 * lead() yields NULLs, which are no-op ingests exactly like real NULL
 * values, so the frame clips at both ends with no special cases.
 *
 * Contract (enforced loudly, never silently wrong):
 *  - rows arrive partition-contiguous in window order; row_number()==1
 *    resets the state, every later row must be lastRn+1 (a repeat of
 *    lastRn returns the cached answer — idempotent under expression
 *    duplication); anything else throws. The dialect only emits this
 *    call when EVERY window spec in the statement shares one
 *    (PARTITION BY, ORDER BY) prefix, so the feeding WindowExec is the
 *    one directly below the projection and streams in exactly this
 *    order. The UDF is additionally registered NON-DETERMINISTIC so
 *    Catalyst cannot push an outer predicate between that WindowExec
 *    and the projection (r12 ADVICE high), and every row carries a
 *    partition-key fingerprint — a partition change without rn==1
 *    throws even when the row numbers happen to line up.
 *  - state is per (executor thread, cfg site): the cfg string carries
 *    a translation-unique site id, and the map is a ThreadLocal, so
 *    instance sharing across call sites / sequential tasks on a pooled
 *    thread cannot alias state. cfg also carries a per-STATEMENT
 *    generation id: a task evaluates exactly one statement, so the
 *    first row of a different generation proves every retained site
 *    belongs to a finished statement — the whole map is cleared there
 *    (r12 ADVICE: site ids are translation-unique, so without this the
 *    last partition's treap per site leaked for the executor's life).
 *
 * cfg = "mode#site#prec#q#intdom#distinct#gen" with mode =
 * {mad,qcont,qlerp,qdisc,ent} x {_run,_range,_prec,_folw}.
 * prec: "A" = trailing frame [i-A, i]; "A_B" = [i-A, i-B] (values
 * enter the multiset with a B-row delay); "A_fB" = [i-A, i+B] via the
 * shifted input; "u_fB" = [1, i+B] (no eviction, shifted input).
 * vals: ROWS modes get array(CAST(x AS DOUBLE)) (one element, may be
 * null; folw modes: lead(x, b), b+1 seed elements at rn=1); RANGE
 * modes get the peer group's non-null values (collect_list OVER RANGE
 * CURRENT ROW AND CURRENT ROW) and cnt = the peer group's ROW count —
 * the first peer row ingests the whole group and the remaining cnt-1
 * rows replay the cached answer (a RANGE running frame always ends at
 * the LAST peer).
 *
 * Value semantics replicate the folds they replace bit-for-bit:
 * Double.compare ordering (NaN last, like Arrays.sort/array_sort),
 * DuckFolds.median's (a+b)/2.0 midpoint and integer-domain
 * floor(m+0.5) on BOTH mad medians, the fold's weighted-form quantile
 * interpolation, quantile_disc's max(1, ceil(q*n)) index rule, and
 * entropy's first-occurrence-order acc - p*log2(p) summation
 * (StrictMath.log, -0.0 merged into 0.0 like the string-repr fold).
 * DISTINCT modes dedupe on the canonical double bit pattern (-0.0
 * folded into 0.0, NaNs collapsed) — see COVERAGE.md for the
 * (pre-cast-distinct) corner this implies for >2^53 integers.
 */
public class DuckWinOS
    implements UDF5<String, Seq<Double>, Long, Long, Long, Double>,
               scala.Function5<String, Seq<Double>, Long, Long, Long, Double> {

    /**
     * scala.Function5 view of {@link #call}: py4j resolves the
     * two-argument {@code functions.udf(f, dataType)} overload set in
     * JVM reflection order, so registration nondeterministically lands
     * on either the typed {@code udf(UDF5, DataType)} overload (which
     * invokes {@code call}) or the untyped {@code udf(AnyRef,
     * DataType)} one (which CASTS to {@code scala.Function5} and
     * invokes {@code apply}). Implementing both makes either pick
     * correct — Function5's curried/tupled are interface default
     * methods since Scala 2.12, so apply() is the only requirement.
     */
    @Override
    public Double apply(String cfg, Seq<Double> vals, Long rn, Long cnt, Long fp) {
        return call(cfg, vals, rn, cnt, fp);
    }

    // ---- order-statistic treap -------------------------------------
    static final class Node {
        double v; long pri; int size; Node l, r;
        Node(double v, long pri) { this.v = v; this.pri = pri; this.size = 1; }
    }

    static int size(Node n) { return n == null ? 0 : n.size; }

    static Node pull(Node n) { n.size = 1 + size(n.l) + size(n.r); return n; }

    /** split into (elements <= v, elements > v) by Double.compare. */
    static Node[] splitLE(Node t, double v) {
        if (t == null) return new Node[]{null, null};
        if (Double.compare(t.v, v) <= 0) {
            Node[] p = splitLE(t.r, v);
            t.r = p[0];
            return new Node[]{pull(t), p[1]};
        }
        Node[] p = splitLE(t.l, v);
        t.l = p[1];
        return new Node[]{p[0], pull(t)};
    }

    /** split into (elements < v, elements >= v) by Double.compare. */
    static Node[] splitLT(Node t, double v) {
        if (t == null) return new Node[]{null, null};
        if (Double.compare(t.v, v) < 0) {
            Node[] p = splitLT(t.r, v);
            t.r = p[0];
            return new Node[]{pull(t), p[1]};
        }
        Node[] p = splitLT(t.l, v);
        t.l = p[1];
        return new Node[]{p[0], pull(t)};
    }

    static Node merge(Node a, Node b) {
        if (a == null) return b;
        if (b == null) return a;
        if (a.pri < b.pri) { a.r = merge(a.r, b); return pull(a); }
        b.l = merge(a, b.l);
        return pull(b);
    }

    /** i-th smallest (1-based). */
    static double select(Node t, int i) {
        while (true) {
            int ls = size(t.l);
            if (i <= ls) { t = t.l; }
            else if (i == ls + 1) { return t.v; }
            else { i -= ls + 1; t = t.r; }
        }
    }

    /** in-order flatten into out[pos..]; returns next position. */
    static int flatten(Node t, double[] out, int pos) {
        if (t == null) return pos;
        pos = flatten(t.l, out, pos);
        out[pos++] = t.v;
        return flatten(t.r, out, pos);
    }

    /** count of elements with Double.compare(e, v) <= 0. */
    static int rankLE(Node t, double v) {
        int r = 0;
        while (t != null) {
            if (Double.compare(t.v, v) <= 0) { r += size(t.l) + 1; t = t.r; }
            else { t = t.l; }
        }
        return r;
    }

    // ---- answer kinds ----------------------------------------------
    static final int K_MAD = 0, K_QCONT = 1, K_QLERP = 2, K_QDISC = 3,
        K_ENT = 4, K_HIST = 5;

    static int kindOf(String mode) {
        if (mode.startsWith("mad")) return K_MAD;
        if (mode.startsWith("qlerp")) return K_QLERP;
        if (mode.startsWith("qcont")) return K_QCONT;
        if (mode.startsWith("qdisc")) return K_QDISC;
        if (mode.startsWith("ent")) return K_ENT;
        if (mode.startsWith("hist")) return K_HIST;
        throw new IllegalStateException("DuckWinOS: unknown mode " + mode);
    }

    // ---- per-site streaming state ----------------------------------
    static final class State {
        int kind;
        boolean needTreap;     // mad/qcont/qlerp/qdisc
        boolean needCounts;    // ent/hist value-count multiset
        boolean distAgg;       // DISTINCT rider on ent/hist: every
                               // live distinct value counts ONCE
        Node root;
        long lastRn;
        long fp;               // partition-key fingerprint at rn==1
        long remaining;        // RANGE peer rows left to replay
        boolean replay;        // this row returns st.cached as-is
        Object cached;
        LinkedList<Double> frame; // prec/folw modes: physical slots
        HashSet<Long> seen;       // distinct, insert-only modes
        HashMap<Long, long[]> counts; // distinct+evicting: canon -> {count, reprBits}
        // ent/hist: value -> {count}; LinkedHashMap so insert-only
        // modes answer in first-occurrence order (the fold's order)
        LinkedHashMap<Long, long[]> vcounts;
        long vtotal;
        long rng;

        long nextPri() {
            rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17;
            return rng;
        }

        // default 2^26; -Dduckspark.winos.maxBuffer overrides (ops
        // tuning + a testable loud-raise path without a 67M-row run)
        final int maxBuf =
            Integer.getInteger("duckspark.winos.maxBuffer", 1 << 26);

        void insert(double v) {
            if (size(root) >= maxBuf)
                throw new IllegalStateException(
                    "DuckWinOS: window partition exceeds " + maxBuf
                    + " buffered values (2^26 default;"
                    + " -Dduckspark.winos.maxBuffer) — repartition the"
                    + " window or restructure the query (same class of"
                    + " bound as the collect_list template's group"
                    + " limit)");
            Node[] p = splitLE(root, v);
            root = merge(merge(p[0], new Node(v, nextPri())), p[1]);
        }

        void remove(double v) {
            Node[] a = splitLT(root, v);
            Node[] b = splitLE(a[1], v);
            if (b[0] == null)
                throw new IllegalStateException("DuckWinOS: removing absent value");
            root = merge(a[0], merge(merge(b[0].l, b[0].r), b[1]));
        }
    }

    static final class ThreadStates {
        String gen = "";
        final HashMap<String, State> states = new HashMap<>();
    }

    static final ThreadLocal<ThreadStates> STATES =
        ThreadLocal.withInitial(ThreadStates::new);

    /** distinct key: raw bits with NaNs collapsed to the canonical
     *  pattern — probed to be exactly what this Spark's runtime
     *  array_distinct does on doubles (it keeps 0.0 and -0.0 as two
     *  DISTINCT elements, unlike the constant-folded literal path). */
    static long canon(double v) { return Double.doubleToLongBits(v); }

    /** entropy count key: the string-repr fold merges float "-0.0"
     *  into "0.0" (SQL equality); NaNs collapse like canon(). */
    static long canonEnt(double v) {
        if (v == 0.0) return Double.doubleToLongBits(0.0);
        return Double.doubleToLongBits(v);
    }

    /** Shared stream bookkeeping for every answer class. Returns the
     *  ready state, with st.cached set when this row replays a cached
     *  answer (expression duplication or RANGE peer) — the caller
     *  returns st.cached as-is then. */
    static State advance(
        String cfg, Seq<Double> vals, Long rn, Long cnt, Long fp
    ) {
        if (cfg == null || rn == null || cnt == null || fp == null)
            throw new IllegalStateException("DuckWinOS: null control argument");
        String[] p = cfg.split("#", -1);
        String mode = p[0];
        // prec "A" = trailing frame [i-A, i]; "A_B" = [i-A, i-B]
        // (values enter the multiset with a B-row delay); "A_fB" =
        // [i-A, i+B] via lead-shifted input; "u_fB" = [1, i+B]
        int prec = 0, precHi = 0;
        boolean folwRun = false;
        int us = p[2].indexOf('_');
        if (us >= 0) {
            String hiPart = p[2].substring(us + 1);
            if (hiPart.startsWith("f")) {
                int b = Integer.parseInt(hiPart.substring(1));
                if (p[2].charAt(0) == 'u') {
                    folwRun = true; // unbounded preceding: never evict
                } else {
                    prec = Integer.parseInt(p[2].substring(0, us)) + b;
                }
            } else {
                prec = Integer.parseInt(p[2].substring(0, us));
                precHi = Integer.parseInt(hiPart);
            }
        } else {
            prec = Integer.parseInt(p[2]);
        }
        boolean dist = p[5].equals("1");
        boolean isRange = mode.endsWith("_range");
        boolean isFolw = mode.endsWith("_folw");
        boolean isPrec = mode.endsWith("_prec") || (isFolw && !folwRun);

        ThreadStates ts = STATES.get();
        String gen = p.length > 6 ? p[6] : "";
        if (!gen.equals(ts.gen)) {
            // first row of a NEW statement on this pooled thread: every
            // retained site belongs to a finished statement (one task
            // evaluates one statement) — release their state
            ts.states.clear();
            ts.gen = gen;
        }
        State st = ts.states.get(cfg);
        if (rn == 1L || st == null) {
            if (rn != 1L)
                throw new IllegalStateException(
                    "DuckWinOS: stream started at rn=" + rn
                    + " — window rows did not arrive partition-contiguous"
                    + " (or this site's state was evicted mid-stream)");
            st = new State();
            st.kind = kindOf(mode);
            st.needTreap = st.kind != K_ENT && st.kind != K_HIST;
            st.needCounts = st.kind == K_ENT || st.kind == K_HIST;
            st.distAgg = dist && st.needCounts;
            st.rng = 0x9E3779B97F4A7C15L ^ (long) cfg.hashCode() | 1L;
            st.fp = fp;
            if (isPrec) st.frame = new LinkedList<>();
            if (dist) {
                if (isPrec) st.counts = new HashMap<>();
                else st.seen = new HashSet<>();
            }
            if (st.needCounts) st.vcounts = new LinkedHashMap<>();
            ts.states.put(cfg, st);
        } else if (fp != st.fp) {
            throw new IllegalStateException(
                "DuckWinOS: partition fingerprint changed without a"
                + " row_number reset (rn=" + rn + ") — window rows did"
                + " not arrive partition-contiguous");
        } else if (rn == st.lastRn) {
            // duplicated evaluation of the same row (CSE / collapsed
            // projection): idempotent replay
            st.replay = true;
            return st;
        } else if (rn != st.lastRn + 1) {
            throw new IllegalStateException(
                "DuckWinOS: window rows arrived out of order (rn=" + rn
                + ", last=" + st.lastRn
                + ") — streaming lowering requires ordered partition rows");
        } else if (isRange && st.remaining > 0) {
            st.lastRn = rn;
            st.remaining--;
            st.replay = true;
            return st;
        }
        st.lastRn = rn;
        st.replay = false;

        // ingest this row (ROWS modes) or the whole peer group (RANGE)
        if (isPrec) {
            if (isFolw && rn == 1L && vals != null) {
                // seed: lead(x, 0..b) — each element is one slot
                Iterator<Double> it = vals.iterator();
                while (it.hasNext()) ingestSlot(st, it.next(), dist, prec, precHi);
            } else {
                Double x = null;
                if (vals != null && vals.size() > 0) x = vals.apply(0);
                ingestSlot(st, x, dist, prec, precHi);
            }
        } else if (isFolw && folwRun) {
            // [1, i+b]: every element ingests, nothing ever leaves
            if (vals != null) {
                Iterator<Double> it = vals.iterator();
                while (it.hasNext()) {
                    Double d = it.next();
                    if (d != null) ingest(st, d, dist, false);
                }
            }
        } else if (vals != null) {
            Iterator<Double> it = vals.iterator();
            while (it.hasNext()) {
                Double d = it.next();
                if (d != null) ingest(st, d, dist, false);
            }
        }
        if (isRange) st.remaining = cnt - 1;
        return st;
    }

    static void ingestSlot(
        State st, Double x, boolean dist, int prec, int precHi
    ) {
        st.frame.addLast(x);
        // the value reaching age precHi enters the multiset (B=0:
        // immediately); the one aging past prec leaves it
        int sz = st.frame.size();
        if (sz > precHi) {
            Double in = st.frame.get(sz - 1 - precHi);
            if (in != null) ingest(st, in, dist, true);
        }
        if (sz > prec + 1) {
            Double old = st.frame.removeFirst();
            if (old != null) evict(st, old, dist);
        }
    }

    @Override
    public Double call(String cfg, Seq<Double> vals, Long rn, Long cnt, Long fp) {
        State st = advance(cfg, vals, rn, cnt, fp);
        if (st.replay) return (Double) st.cached;
        Double ans;
        switch (st.kind) {
            case K_MAD:
                ans = mad(st.root, intdom(cfg));
                break;
            case K_QDISC: {
                int k = size(st.root);
                if (k == 0) { ans = null; break; }
                double q = qOf(cfg);
                int idx = (int) Math.ceil(q * k);
                if (idx < 1) idx = 1;
                if (idx > k) idx = k;
                ans = select(st.root, idx);
                break;
            }
            case K_ENT:
                ans = entropy(st);
                break;
            default:
                ans = qcont(st.root, qOf(cfg), st.kind == K_QLERP);
        }
        st.cached = ans;
        return ans;
    }

    /** 0 exact double, 1 temporal floor(m+0.5), 2 DECIMAL unscaled
     *  truncation toward zero (r13) — applied to BOTH mad medians. */
    static int intdom(String cfg) {
        String[] p = cfg.split("#", -1);
        return Integer.parseInt(p[4]);
    }

    static double qOf(String cfg) {
        String[] p = cfg.split("#", -1);
        return Double.parseDouble(p[3]);
    }

    static void ingest(State st, double v, boolean dist, boolean prec) {
        if (st.needCounts) {
            long c = st.kind == K_ENT ? canonEnt(v) : canon(v);
            long[] e = st.vcounts.get(c);
            if (e == null) st.vcounts.put(c, new long[]{1});
            else e[0]++;
            st.vtotal++;
            return;
        }
        if (!dist) { st.insert(v); return; }
        long c = canon(v);
        if (prec) {
            long[] e = st.counts.get(c);
            if (e == null) {
                st.counts.put(c, new long[]{1, Double.doubleToRawLongBits(v)});
                st.insert(v);
            } else {
                e[0]++;
            }
        } else if (st.seen.add(c)) {
            st.insert(v);
        }
    }

    static void evict(State st, double v, boolean dist) {
        if (st.needCounts) {
            long c = st.kind == K_ENT ? canonEnt(v) : canon(v);
            long[] e = st.vcounts.get(c);
            if (e == null)
                throw new IllegalStateException("DuckWinOS: evicting absent value");
            if (--e[0] == 0) st.vcounts.remove(c);
            st.vtotal--;
            return;
        }
        if (!dist) { st.remove(v); return; }
        long c = canon(v);
        long[] e = st.counts.get(c);
        if (e == null)
            throw new IllegalStateException("DuckWinOS: evicting absent value");
        if (--e[0] == 0) {
            st.counts.remove(c);
            st.remove(Double.longBitsToDouble(e[1]));
        }
    }

    // ---- answers ----------------------------------------------------
    private static final double LOG2 = StrictMath.log(2.0);

    /** Shannon entropy in the fold's exact order: first occurrence
     *  within the FRAME, acc - p*log2(p) sequential IEEE adds. For
     *  insert-only modes the LinkedHashMap's insertion order IS frame
     *  first-occurrence order; evicting modes walk the live frame
     *  slots (an eviction can move a value's first occurrence later,
     *  which the map's original position would misreport). */
    static Double entropy(State st) {
        if (st.vtotal == 0) return 0.0;
        // DISTINCT: the fold dedupes the frame first, so every live
        // distinct value contributes count 1 over total = #distinct
        double total = st.distAgg
            ? (double) st.vcounts.size() : (double) st.vtotal;
        double acc = 0.0;
        if (st.frame == null) {
            for (long[] c : st.vcounts.values()) {
                double pr = (st.distAgg ? 1.0 : c[0]) / total;
                acc = acc - pr * (StrictMath.log(pr) / LOG2);
            }
            return acc;
        }
        HashSet<Long> seenK = new HashSet<>();
        // live slots only: the trailing precHi slots are not yet in
        // the multiset (delayed-entry frames) — ingestSlot ingests at
        // age precHi, so stop the walk precHi short of the end.
        // (ent never pairs with precHi today; kept for symmetry.)
        int live = st.frame.size();
        int i = 0;
        for (Double d : st.frame) {
            if (i++ >= live) break;
            if (d == null) continue;
            long k = canonEnt(d);
            long[] c = st.vcounts.get(k);
            if (c == null || !seenK.add(k)) continue;
            double pr = (st.distAgg ? 1.0 : c[0]) / total;
            acc = acc - pr * (StrictMath.log(pr) / LOG2);
        }
        return acc;
    }

    static double domRound(double m, int dom) {
        if (!Double.isFinite(m)) return m;
        if (dom == 1) return Math.floor(m + 0.5);
        if (dom == 2) return (double) (long) m;
        return m;
    }

    static Double mad(Node root, int intdom) {
        int k = size(root);
        if (k == 0) return null;
        double m = (k % 2 == 1)
            ? select(root, (k + 1) / 2)
            : (select(root, k / 2) + select(root, k / 2 + 1)) / 2.0;
        m = domRound(m, intdom);
        if (Double.isNaN(m)) return Double.NaN;
        if (Double.isInfinite(m)) {
            // inf - inf = NaN puts a NaN distance in the MIDDLE of the
            // left/right runs, breaking the merge's monotonicity — fall
            // back to the exact O(k) fold for this degenerate median
            double[] v = new double[k];
            flatten(root, v, 0);
            for (int i = 0; i < k; i++) v[i] = Math.abs(v[i] - m);
            java.util.Arrays.sort(v);
            return DuckFolds.median(v, k, intdom);
        }
        double d;
        if (k % 2 == 1) {
            d = kthDist(root, k, m, (k + 1) / 2);
        } else {
            d = (kthDist(root, k, m, k / 2)
                 + kthDist(root, k, m, k / 2 + 1)) / 2.0;
        }
        return domRound(d, intdom);
    }

    static Double qcont(Node root, double q, boolean lerp) {
        int k = size(root);
        if (k == 0) return null;
        // DOUBLE domain: the weighted form (higher-pos)*lo +
        // (pos-lower)*hi in this exact operation order — bit-identical
        // to BOTH Spark's native Percentile.getPercentile and DuckDB's
        // double Interpolate (probed; lo + frac*(hi-lo) differs by 1-2
        // ulp on ~23% of triples). DECIMAL domain (lerp=true, values
        // pre-unscaled to integers): DuckDB's integer Interpolate is
        // the OTHER formula, lo + (hi-lo)*frac (probed on 40/40
        // truncation-boundary cases); the SQL wrapper truncates.
        double pos = q * (k - 1);
        double lower = Math.floor(pos);
        double higher = Math.ceil(pos);
        double lo = select(root, Math.min(k, (int) lower + 1));
        if (higher == lower) return lo;
        double hi = select(root, Math.min(k, (int) higher + 1));
        if (lerp) return lo + (hi - lo) * (pos - lower);
        return (higher - pos) * lo + (pos - lower) * hi;
    }

    /** t-th smallest left distance m - select(L-t+1); t > L -> NaN
     *  sentinel (compares above every real distance). */
    static double dL(Node root, int L, double m, int t) {
        if (t < 1) return Double.NEGATIVE_INFINITY;
        if (t > L) return Double.NaN;
        return m - select(root, L - t + 1);
    }

    /** u-th smallest right distance select(L+u) - m. */
    static double dR(Node root, int k, int L, double m, int u) {
        if (u < 1) return Double.NEGATIVE_INFINITY;
        if (u > k - L) return Double.NaN;
        return select(root, L + u) - m;
    }

    /** j-th smallest |x - m| over the multiset: the distance sequence
     *  is the merge of two sorted-by-construction runs (values below m
     *  walking down, values above m walking up); binary search the
     *  split. Distances of NaN elements are NaN and sort last under
     *  Double.compare, exactly like the Arrays.sort fold. */
    static double kthDist(Node root, int k, double m, int j) {
        int L = rankLE(root, m);
        int R = k - L;
        int lo = Math.max(0, j - R), hi = Math.min(j, L);
        while (lo < hi) {
            int t = (lo + hi) >>> 1;
            // t left-takes suffice iff next-right <= next-left
            if (Double.compare(dR(root, k, L, m, j - t), dL(root, L, m, t + 1)) > 0)
                lo = t + 1;
            else
                hi = t;
        }
        double a = dL(root, L, m, lo);
        double b = dR(root, k, L, m, j - lo);
        return Double.compare(a, b) >= 0 ? a : b;
    }
}
