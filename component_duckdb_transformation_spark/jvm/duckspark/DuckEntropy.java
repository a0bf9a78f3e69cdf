package duckspark;

import org.apache.spark.sql.api.java.UDF2;
import scala.collection.Iterator;
import scala.collection.Seq;
import java.util.LinkedHashMap;
import java.util.Map;

/**
 * entropy(x) fold over one collected frame/group array (dialect.py
 * _entropy_fold_sql's compiled core). The dialect casts the collected
 * array to ARRAY&lt;STRING&gt; first — Java reprs are round-trip, so
 * string equality == value equality — and this core counts runs in
 * first-occurrence order (matching array_distinct's order in the
 * retired interpreted fold) and folds acc - p*log2(p) in the same
 * IEEE order, log2 as StrictMath.log(p)/StrictMath.log(2.0) (bit-equal to
 * Spark's LOG2 — the Math.log intrinsic differs in the last ulp).
 * Empty array -> 0.0 (DuckDB's empty/all-NULL result). elemType is
 * typeof() of one element: for float/double elements "-0.0" merges
 * into "0.0" (SQL equality treats them equal in both engines; string
 * elements spelled "-0.0" must stay distinct). Replaces an
 * O(distinct * n) interpreted filter-per-distinct scan with one
 * compiled counting pass.
 */
public class DuckEntropy implements UDF2<Seq<String>, String, Double> {
    private static final double LOG2 = StrictMath.log(2.0);

    @Override
    public Double call(Seq<String> arr, String elemType) {
        if (arr == null) return null;
        boolean fl = elemType != null
            && (elemType.startsWith("double") || elemType.startsWith("float"));
        Map<String, int[]> counts = new LinkedHashMap<>();
        int n = 0;
        Iterator<String> it = arr.iterator();
        while (it.hasNext()) {
            String s = it.next();
            if (s == null) continue;
            if (fl && s.equals("-0.0")) s = "0.0";
            n++;
            int[] c = counts.get(s);
            if (c == null) counts.put(s, new int[] {1});
            else c[0]++;
        }
        if (n == 0) return 0.0;
        double total = (double) n;
        double acc = 0.0;
        for (int[] c : counts.values()) {
            double p = c[0] / total;
            acc = acc - p * (StrictMath.log(p) / LOG2);
        }
        return acc;
    }
}
