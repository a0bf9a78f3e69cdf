package duckspark;

import org.apache.spark.sql.api.java.UDF2;
import java.util.ArrayList;
import java.util.HashSet;

/**
 * Word n-gram counters for repetition/quality signals, one compiled
 * pass per document (operators/text_analysis.py::repetition_signals).
 *
 * Contract (must match BOTH the retired pure-column Spark expression
 * and the DuckDB oracle of workload x37):
 *   - tokenization is split-on-single-space with empties preserved
 *     (Spark split(text,' ') / DuckDB string_split): k separator
 *     spaces yield k+1 words, "" yields the single word "".
 *   - for each n in the csv list: total = max(0, n_words - n + 1)
 *     n-gram occurrences, and the count of DISTINCT n-grams, where an
 *     n-gram is the space-join of n consecutive words. Because every
 *     separator is exactly one space, that join IS the substring of
 *     the document between the first word's start and the last word's
 *     end — so distinctness is computed over raw substrings with no
 *     per-gram string assembly in the query plan.
 *   - n = 1 gives (n_words, n_distinct_words).
 *   - NULL text -> NULL (SQL semantics; the oracle's len(NULL) path).
 *
 * Returns a flat array<bigint> [total_n0, distinct_n0, total_n1, ...]
 * in csv order.
 */
public class DuckNgramStats implements UDF2<String, String, long[]> {
    @Override
    public long[] call(String text, String nsCsv) {
        if (text == null || nsCsv == null) return null;
        String[] nsParts = nsCsv.split(",");
        int len = text.length();
        ArrayList<Integer> starts = new ArrayList<>();
        starts.add(0);
        for (int i = 0; i < len; i++) {
            if (text.charAt(i) == ' ') starts.add(i + 1);
        }
        int nWords = starts.size();
        long[] out = new long[2 * nsParts.length];
        HashSet<String> set = new HashSet<>();
        for (int k = 0; k < nsParts.length; k++) {
            int n = Integer.parseInt(nsParts[k].trim());
            if (n < 1) throw new IllegalArgumentException("n must be >= 1: " + n);
            int total = nWords - n + 1;
            if (total < 0) total = 0;
            set.clear();
            for (int i = 0; i < total; i++) {
                int s = starts.get(i);
                int e = (i + n < nWords) ? starts.get(i + n) - 1 : len;
                set.add(text.substring(s, e));
            }
            out[2 * k] = total;
            out[2 * k + 1] = set.size();
        }
        return out;
    }
}
