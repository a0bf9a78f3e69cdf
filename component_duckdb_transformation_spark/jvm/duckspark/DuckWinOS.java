package duckspark;

import org.apache.spark.sql.api.java.UDF4;
import scala.collection.Iterator;
import scala.collection.Seq;
import java.util.HashMap;
import java.util.HashSet;
import java.util.LinkedList;

/**
 * Streaming order-statistics window core: O(log^2 frame) per row
 * running/moving mad() and quantile_cont() over RUNNING (ROWS/RANGE
 * UNBOUNDED PRECEDING .. CURRENT ROW) and bounded trailing (ROWS k
 * PRECEDING .. CURRENT ROW) frames — the compiled replacement for the
 * O(frame log frame)-per-row collect_list folds (dialect.py
 * _mad_window_template / _quantile_cont_fold_sql) on those shapes.
 * DuckDB's windowed aggregate executor solves the same problem with a
 * segment tree; here an order-statistic treap (rank/select multiset in
 * Double.compare order) is maintained incrementally as WindowExec
 * streams partition rows in order.
 *
 * Contract (enforced loudly, never silently wrong):
 *  - rows arrive partition-contiguous in window order; row_number()==1
 *    resets the state, every later row must be lastRn+1 (a repeat of
 *    lastRn returns the cached answer — idempotent under expression
 *    duplication); anything else throws. The dialect only emits this
 *    call when EVERY window spec in the statement shares one
 *    (PARTITION BY, ORDER BY) prefix, so the feeding WindowExec is the
 *    one directly below the projection and streams in exactly this
 *    order.
 *  - state is per (executor thread, cfg site): the cfg string carries
 *    a translation-unique site id, and the map is a ThreadLocal, so
 *    instance sharing across call sites / sequential tasks on a pooled
 *    thread cannot alias state.
 *
 * cfg = "mode#site#prec#q#intdom#distinct" with mode in
 * {mad_run, mad_range, mad_prec, qcont_run, qcont_range, qcont_prec}.
 * vals: ROWS modes get array(CAST(x AS DOUBLE)) (one element, may be
 * null); RANGE modes get the peer group's non-null values
 * (collect_list OVER RANGE CURRENT ROW AND CURRENT ROW) and cnt = the
 * peer group's ROW count — the first peer row ingests the whole group
 * and the remaining cnt-1 rows replay the cached answer (a RANGE
 * running frame always ends at the LAST peer).
 *
 * Value semantics replicate the folds they replace bit-for-bit:
 * Double.compare ordering (NaN last, like Arrays.sort/array_sort),
 * DuckFolds.median's (a+b)/2.0 midpoint and integer-domain
 * floor(m+0.5) on BOTH mad medians, and the fold's
 * lo + (pos-floor(pos))*(hi-lo) quantile interpolation. DISTINCT
 * modes dedupe on the canonical double bit pattern (-0.0 folded into
 * 0.0, NaNs collapsed) — see COVERAGE.md for the (pre-cast-distinct)
 * corner this implies for >2^53 integers.
 */
public class DuckWinOS implements UDF4<String, Seq<Double>, Long, Long, Double> {

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

    // ---- per-site streaming state ----------------------------------
    static final class State {
        Node root;
        long lastRn;
        long remaining;           // RANGE peer rows left to replay
        Double cached;
        LinkedList<Double> frame; // prec modes: trailing physical rows
        HashSet<Long> seen;       // distinct, insert-only modes
        HashMap<Long, long[]> counts; // distinct+prec: canon -> {count, reprBits}
        long rng;

        long nextPri() {
            rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17;
            return rng;
        }

        void insert(double v) {
            if (size(root) >= (1 << 26))
                throw new IllegalStateException(
                    "DuckWinOS: window partition exceeds 2^26 buffered"
                    + " values — repartition the window or restructure"
                    + " the query (same class of bound as the"
                    + " collect_list template's group limit)");
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

    static final ThreadLocal<HashMap<String, State>> STATES =
        ThreadLocal.withInitial(HashMap::new);

    /** distinct key: raw bits with NaNs collapsed to the canonical
     *  pattern — probed to be exactly what this Spark's runtime
     *  array_distinct does on doubles (it keeps 0.0 and -0.0 as two
     *  DISTINCT elements, unlike the constant-folded literal path). */
    static long canon(double v) { return Double.doubleToLongBits(v); }

    @Override
    public Double call(String cfg, Seq<Double> vals, Long rn, Long cnt) {
        if (cfg == null || rn == null || cnt == null)
            throw new IllegalStateException("DuckWinOS: null control argument");
        String[] p = cfg.split("#", -1);
        String mode = p[0];
        // prec "A" = trailing frame [i-A, i]; "A_B" = [i-A, i-B]
        // (values enter the multiset with a B-row delay)
        int prec, precHi = 0;
        int us = p[2].indexOf('_');
        if (us >= 0) {
            prec = Integer.parseInt(p[2].substring(0, us));
            precHi = Integer.parseInt(p[2].substring(us + 1));
        } else {
            prec = Integer.parseInt(p[2]);
        }
        double q = Double.parseDouble(p[3]);
        boolean intdom = p[4].equals("1");
        boolean dist = p[5].equals("1");
        boolean isMad = mode.startsWith("mad");
        boolean isRange = mode.endsWith("_range");
        boolean isPrec = mode.endsWith("_prec");

        HashMap<String, State> states = STATES.get();
        State st = states.get(cfg);
        if (rn == 1L || st == null) {
            if (rn != 1L)
                throw new IllegalStateException(
                    "DuckWinOS: stream started at rn=" + rn
                    + " — window rows did not arrive partition-contiguous");
            st = new State();
            st.rng = 0x9E3779B97F4A7C15L ^ (long) cfg.hashCode() | 1L;
            if (isPrec) st.frame = new LinkedList<>();
            if (dist) {
                if (isPrec) st.counts = new HashMap<>();
                else st.seen = new HashSet<>();
            }
            states.put(cfg, st);
        } else if (rn == st.lastRn) {
            // duplicated evaluation of the same row (CSE / collapsed
            // projection): idempotent replay
            return st.cached;
        } else if (rn != st.lastRn + 1) {
            throw new IllegalStateException(
                "DuckWinOS: window rows arrived out of order (rn=" + rn
                + ", last=" + st.lastRn
                + ") — streaming lowering requires ordered partition rows");
        } else if (isRange && st.remaining > 0) {
            st.lastRn = rn;
            st.remaining--;
            return st.cached;
        }
        st.lastRn = rn;

        // ingest this row (ROWS modes) or the whole peer group (RANGE)
        if (isPrec) {
            Double x = null;
            if (vals != null && vals.size() > 0) x = vals.apply(0);
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
        } else if (vals != null) {
            Iterator<Double> it = vals.iterator();
            while (it.hasNext()) {
                Double d = it.next();
                if (d != null) ingest(st, d, dist, false);
            }
        }
        if (isRange) st.remaining = cnt - 1;

        st.cached = isMad ? mad(st.root, intdom)
            : qcont(st.root, q, mode.startsWith("qlerp"));
        return st.cached;
    }

    static void ingest(State st, double v, boolean dist, boolean prec) {
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
    static Double mad(Node root, boolean intdom) {
        int k = size(root);
        if (k == 0) return null;
        double m = (k % 2 == 1)
            ? select(root, (k + 1) / 2)
            : (select(root, k / 2) + select(root, k / 2 + 1)) / 2.0;
        if (intdom) m = Math.floor(m + 0.5);
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
        return intdom ? Math.floor(d + 0.5) : d;
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
