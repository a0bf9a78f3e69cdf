package duckspark;

import org.apache.spark.sql.api.java.UDF5;
import scala.collection.Seq;
import java.util.LinkedHashMap;
import java.util.Map;

/**
 * Streaming histogram() window aggregate over the DuckWinOS state
 * machinery (same cfg/contract — mode family "hist_*"): maintains the
 * frame's value-count multiset incrementally and answers a
 * key-ascending map per row, replacing the O(frame)-per-row
 * collect_list + array_distinct + filter-per-key fold
 * (dialect.py _histogram_fold_sql) on streamable frame shapes.
 *
 * Fold parity: keys are the frame's DISTINCT bit patterns (NaNs
 * collapsed, -0.0 kept separate — array_distinct's behavior on
 * doubles), ascending by Double.compare; each key's count replicates
 * size(filter(frame, e -> e = key)) under Spark SQL `=` semantics
 * (NaN = NaN true, -0.0 = 0.0 true: the two zero keys both report the
 * combined count). Empty frame -> NULL, like the fold and DuckDB.
 * The dialect only emits this call for statically-typed numeric
 * arguments whose double image is exact (int domain / DECIMAL w<=15),
 * casting the map back to the argument's type.
 */
public class DuckWinHist
    implements UDF5<String, Seq<Double>, Long, Long, Long, Map<Double, Long>>,
               scala.Function5<String, Seq<Double>, Long, Long, Long,
                               Map<Double, Long>> {

    /** scala.Function5 view of {@link #call} — see DuckWinOS.apply:
     *  py4j may register these cores through the untyped
     *  {@code udf(AnyRef, DataType)} overload, which casts to
     *  Function5 and invokes apply(). */
    @Override
    public Map<Double, Long> apply(
        String cfg, Seq<Double> vals, Long rn, Long cnt, Long fp
    ) {
        return call(cfg, vals, rn, cnt, fp);
    }

    @Override
    @SuppressWarnings("unchecked")
    public Map<Double, Long> call(
        String cfg, Seq<Double> vals, Long rn, Long cnt, Long fp
    ) {
        DuckWinOS.State st = DuckWinOS.advance(cfg, vals, rn, cnt, fp);
        if (st.replay) return (Map<Double, Long>) st.cached;
        Map<Double, Long> ans = answer(st);
        st.cached = ans;
        return ans;
    }

    static Map<Double, Long> answer(DuckWinOS.State st) {
        if (st.vtotal == 0) return null;
        int n = st.vcounts.size();
        double[] keys = new double[n];
        int i = 0;
        for (Long k : st.vcounts.keySet())
            keys[i++] = Double.longBitsToDouble(k);
        java.util.Arrays.sort(keys); // ascending, -0.0 < 0.0, NaN last
        LinkedHashMap<Double, Long> out = new LinkedHashMap<>(n * 2);
        for (double kv : keys) {
            long c;
            if (st.distAgg) {
                // DISTINCT rider: the fold counts over the DEDUPED
                // frame — every key reports 1
                out.put(kv, 1L);
                continue;
            }
            if (kv == 0.0) {
                // Spark `=` merges the zeros: both keys (if present)
                // report the combined count
                long pz = cnt0(st, Double.doubleToLongBits(0.0));
                long nz = cnt0(st, Double.doubleToLongBits(-0.0));
                c = pz + nz;
            } else {
                c = cnt0(st, Double.doubleToLongBits(kv));
            }
            out.put(kv, c);
        }
        return out;
    }

    private static long cnt0(DuckWinOS.State st, long bits) {
        long[] e = st.vcounts.get(bits);
        return e == null ? 0L : e[0];
    }
}
