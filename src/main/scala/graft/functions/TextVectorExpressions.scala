package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the text/vector expressions. One static call per
  * row from generated code — stays inside WholeStageCodegen, avoids a
  * deep generic array-expression tree (which allocates per element).
  */
object Kernels {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes — stable token hash (engine-neutral,
    * unlike Spark's Murmur3 seed choices). */
  def fnv64(s: UTF8String): Long = {
    val b = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** 64-bit SimHash over token FNV hashes (majority vote per bit). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = fnv64(tokens.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** k-permutation MinHash signature over token FNV hashes using the
    * standard (a*h + b) mod p universal family; deterministic params
    * from a splitmix64 stream so every executor agrees without
    * broadcasting state. */
  /** The k (a, b) affine-permutation constants behind [[minhashSig]]
    * — exposed so the DuckDB oracle builder can embed the EXACT same
    * constants as literals and replay the signature chain
    * (splitmix64 seed walk, a forced odd). */
  private[graft] def minhashParams(k: Int): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](k)
    var s = 0x9e3779b97f4a7c15L
    var j = 0
    while (j < k) {
      s += 0x9e3779b97f4a7c15L; val a = mix(s) | 1L
      s += 0x9e3779b97f4a7c15L; val b = mix(s)
      out(j) = (a, b)
      j += 1
    }
    out
  }

  def minhashSig(tokens: ArrayData, k: Int): ArrayData =
    new GenericArrayData(minhashSigArr(tokens, k))

  private def minhashSigArr(tokens: ArrayData, k: Int): Array[Long] = {
    val p = 2305843009213693951L // 2^61 - 1 Mersenne prime
    val n = tokens.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = fnv64(tokens.getUTF8String(i)) & Long.MaxValue; i += 1 }
    val sig = new Array[Long](k)
    val params = minhashParams(k)
    var j = 0
    while (j < k) {
      val (a, b) = params(j)
      var mn = Long.MaxValue
      var t = 0
      while (t < n) {
        // (a*h+b) mod p via Mersenne fold keeps it branch-light
        val x = java.lang.Math.floorMod(a * hs(t) + b, p)
        if (x < mn) mn = x
        t += 1
      }
      sig(j) = if (n == 0) 0L else mn
      j += 1
    }
    sig
  }

  /** Fused LSH band-bucket hashes: the k-perm [[minhashSig]] computed
    * ONCE, then each of the `bands` signature slices folded through
    * Spark's own XXH64 long chain (seed 42) — bit-identical to
    * `xxhash64(slice(minhash_sig(toks), band*rows+1, rows))`, which is
    * what this kernel replaces. The unfused form referenced `sig` from
    * `bands` sibling expressions in one projection, and CollapseProject
    * re-evaluated the whole tokenize→sig chain per band (the r12
    * q_dedup_minhash 1.85× regression); a single kernel output makes
    * one-evaluation a structural property instead of an optimizer
    * accident. Duplicate tokens cannot change a min, so callers may
    * skip the `array_distinct` the unfused path needed. */
  def minhashBandHashes(tokens: ArrayData, k: Int, bands: Int): ArrayData = {
    val sig = minhashSigArr(tokens, k)
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var i = 0
      while (i < rows) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(sig(b * rows + i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Polynomial rolling hash over UTF-8 bytes: h = h*31 + b
    * (mod 1_000_000_007 — the SQL oracles replicate this exact modulus
    * in their list_reduce recurrences, so it is load-bearing).
    * Oracle-parity-friendly (pure integer recurrence). */
  def rollingHash(s: UTF8String): Long = {
    val p = 1000000007L
    val b = s.getBytes
    var h = 0L
    var i = 0
    while (i < b.length) { h = (h * 31 + (b(i) & 0xff)) % p; i += 1 }
    h
  }

  /** Whitespace tokenization as one byte pass: every maximal run of
    * non-space bytes (space = 0x20, never part of a UTF-8 multibyte
    * sequence, so the byte walk is encoding-exact). Byte-identical to
    * `filter(split(text, " "), len > 0)` — the HOF chain it replaces,
    * which evaluated as an interpreted CodegenFallback in EVERY text
    * query's hot path. */
  def tokenizeWs(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      if (i < n) cnt += 1
      while (i < n && b(i) != ' ') i += 1
    }
    val out = new Array[AnyRef](cnt)
    var w = 0
    i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val st = i
      while (i < n && b(i) != ' ') i += 1
      if (i > st) {
        out(w) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, st, i))
        w += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct FNV-64 ids of a token array in one fused pass —
    * replaces `array_sort(array_distinct(transform(toks, fnv64)))`
    * (three interpreted HOF nodes) with one codegen'd kernel call. */
  def tokenIdSet(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    val ids = new Array[Long](m)
    var i = 0
    while (i < m) { ids(i) = fnv64(tokens.getUTF8String(i)); i += 1 }
    java.util.Arrays.sort(ids)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || ids(w - 1) != ids(r)) { ids(w) = ids(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ids, w))
  }

  /** float/double array → q16-quantized double array in one pass:
    * floor(x · 65536 + 0.5), the ANN family's integer-exact embedding
    * representation. Replaces the interpreted
    * transform(as_double_array(v), ...) HOF pair in every ANN query's
    * per-row path. Arithmetic identical: float→double widening is
    * exact, then the same double multiply/floor. */
  def quantizeQ16(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = math.floor(x * 65536.0 + 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5-derived Rademacher ±1 JL sign matrix (Achlioptas '03) —
    * a pure constant of (i, j), cached per (inDim, outDim). Shared by
    * [[graft.operators.Ann.jlSignMatrix]] and the fused projection
    * kernel below so the oracle-replayable derivation lives in exactly
    * one place. */
  private val jlSignCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  def jlSigns(inDim: Int, outDim: Int): Array[Array[Double]] =
    jlSignCache.computeIfAbsent((inDim.toLong << 32) | outDim.toLong, _ => {
      val mdt = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(outDim, inDim) { (j, i) =>
        val d = mdt.digest(s"$i:$j".getBytes("UTF-8"))
        if ((d(0) & 0xff) < 0x80) 1.0 else -1.0
      }
    })

  /** Fused q16-quantize + JL projection: p[j] = Σ_i ⌊v[i]·2^16+0.5⌋ ·
    * s(i,j) for all outDim rows in ONE kernel pass. Value-identical to
    * `dot_product(quantize_q16(v), literalRow_j)` per row (all terms
    * exact integers ≪ 2^53, so summation order is irrelevant); replaces
    * the outDim-sibling dot_product projection whose shared `vq` input
    * CollapseProject re-evaluated per sibling (the mechanism behind
    * r12's q_ann_jl re-pin). */
  def jlProjectQ16(a: ArrayData, isFloat: Boolean, inDim: Int,
                   outDim: Int): ArrayData = {
    val mat = jlSigns(inDim, outDim)
    val n = a.numElements()
    val vq = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      vq(i) = math.floor(x * 65536.0 + 0.5)
      i += 1
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      val row = mat(j)
      val m = math.min(n, row.length)
      var s = 0.0
      var t = 0
      while (t < m) { s += vq(t) * row(t); t += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** float/double array → double array (exact widening), the codegen'd
    * replacement for `transform(v, _.cast("double"))`. */
  def castDoubleArray(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** L2 norm of a double array — replaces the interpreted
    * aggregate-HOF sum-of-squares. Same left-to-right double
    * accumulation order as the HOF fold, so values are bit-identical. */
  def l2Norm(a: ArrayData, isFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** Word w-shingles as space-joined strings — one pass over the
    * token array, byte-identical to the transform/slice/concat_ws HOF
    * chain (< n tokens → the whole text as one shingle, matching the
    * SQL twins' CASE). */
  def shingleStrings(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    if (m < n) {
      new GenericArrayData(Array[AnyRef](UTF8String.concatWs(sep, toks: _*)))
    } else {
      val out = new Array[AnyRef](m - n + 1)
      var s = 0
      while (s <= m - n) {
        out(s) = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, s, s + n): _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Luhn checksum validity over a PAN-length ASCII digit string
    * (ISO/IEC 7812): double every second digit from the RIGHT (−9
    * past 9), valid = sum ≡ 0 (mod 10) and 13–19 digits. Non-digit
    * bytes or out-of-range length → false, never an error. One byte
    * pass — the codegen'd replacement for the interpreted
    * aggregate-over-sequence formulation (150 k rows: ~3 s → ~0.1 s). */
  def luhnValid(s: UTF8String): Boolean = {
    val b = s.getBytes
    val n = b.length
    if (n < 13 || n > 19) return false
    var sum = 0
    var i = 0
    while (i < n) {
      val c = b(i) - '0'
      if (c < 0 || c > 9) return false
      val d =
        if (((n - 1 - i) & 1) == 1) { val t = c * 2; if (t > 9) t - 9 else t }
        else c
      sum += d
      i += 1
    }
    sum % 10 == 0
  }

  /** Jaccard of two sorted long arrays (single merge pass, no alloc). */
  def interGeSorted(a: ArrayData, b: ArrayData, minInter: Long): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      if (inter + math.min(n - i, m - j) < minInter) return -1L
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** L101: fused secret/credential scan — ONE pass over the text's
    * whitespace tokens (split on ANY ASCII whitespace — space, tab,
    * LF, CR, FF, VT — empties dropped; config dumps are newline/tab
    * delimited, and a space-only split would glue a credential to its
    * neighbors into one token whose Simpson concentration clears the
    * cap, a false NEGATIVE for a redaction feature). A token is
    * credential-shaped iff ALL of:
    * (1) codepoint length ≥ minLen (keys are long; prose words are
    * not), (2) it mixes an ASCII digit [0-9] AND an ASCII letter
    * [a-zA-Z] (the explicit ASCII classes so the SQL twin replays via
    * two regexes — non-ASCII letters count toward length and
    * concentration but not the mix rule, documented), (3) its Simpson
    * character concentration floor(Σc²·10⁶/n²) ≤ maxSimpsonPpm — the
    * L94 rational entropy surrogate at TOKEN level: random
    * base16/base36/base64 material is near-uniform over its alphabet
    * (md5 hex ≈ 62 500 ppm) while natural-language tokens concentrate.
    * Flagged tokens redact to "[SECRET]"; the rebuilt text joins
    * tokens with single spaces (the tokenizer's view of the doc —
    * whitespace structure, including newlines, is not preserved).
    * Returns (n_tokens, n_secrets, n_masked_cp, redacted). */
  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\u000B'

  def secretScan(text: UTF8String, minLen: Int,
                 maxSimpsonPpm: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val sb = new java.lang.StringBuilder()
    var nTok = 0L; var nSec = 0L; var nMasked = 0L
    var i = 0
    val L = s.length
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    while (i < L) {
      while (i < L && isAsciiWs(s.charAt(i))) i += 1
      if (i < L) {
        val start = i
        while (i < L && !isAsciiWs(s.charAt(i))) i += 1
        nTok += 1
        // one codepoint walk: length, class mix, char histogram
        counts.clear()
        var nCp = 0L; var hasDigit = false; var hasLetter = false
        var j = start
        while (j < i) {
          val cp = s.codePointAt(j)
          nCp += 1
          if (cp >= '0' && cp <= '9') hasDigit = true
          if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z'))
            hasLetter = true
          val k = Integer.valueOf(cp)
          val slot = counts.get(k)
          if (slot == null) counts.put(k, Array(1L)) else slot(0) += 1
          j += Character.charCount(cp)
        }
        var ss = 0L
        val it = counts.values().iterator()
        while (it.hasNext) { val c = it.next()(0); ss += c * c }
        // ss·10⁶ overflows a long past ~3M-codepoint tokens — and a
        // spaceless junk doc IS one giant token (the L94 lesson); the
        // BigInt path keeps parity with the oracle's HUGEINT exactly
        val simpson =
          if (nCp <= 1000000L) ss * 1000000L / (nCp * nCp)
          else (BigInt(ss) * 1000000 / (BigInt(nCp) * nCp)).toLong
        val flagged = nCp >= minLen && hasDigit && hasLetter &&
          simpson <= maxSimpsonPpm
        if (sb.length() > 0) sb.append(' ')
        if (flagged) { nSec += 1; nMasked += nCp; sb.append("[SECRET]") }
        else sb.append(s, start, i)
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nTok, nSec, nMasked, UTF8String.fromString(sb.toString))
  }

  /** L110: fused structured-PII scan — the three sequential
    * regex stages of [[graft.operators.Curate]]'s PII contract
    * (emails, then IPv4s on the email-redacted text, then +phones)
    * in three LINEAR hand scans instead of six backtracking regex
    * passes (measured 5.3 s → the kernel's single job at bench SF).
    * Each matcher replicates the leftmost non-overlapping semantics
    * of its pattern exactly (proofs inline at the skip points):
    * email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`,
    * IPv4 `\b\d{1,3}(\.\d{1,3}){3}\b`, phone `\+[0-9]{7,15}`.
    * A kernel≡regex parity spec (CurationSpec) pins the equivalence
    * on planted pathological inputs and a corpus sample. Returns
    * (n_email, n_ip, n_phone, redacted). */
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlnum(c: Char): Boolean = isAlpha(c) || isDigit(c)
  @inline private def isLocalC(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isHostC(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '-'
  @inline private def isWordC(c: Char): Boolean = isAlnum(c) || c == '_'

  private[functions] def piiEmailPass(s: String): (String, Long) = {
    val sb = new java.lang.StringBuilder(s.length)
    var n = 0L; var i = 0; val L = s.length
    while (i < L) {
      if (isLocalC(s.charAt(i))) {
        var j = i
        while (j < L && isLocalC(s.charAt(j))) j += 1
        // '@' is not in the local class, so the greedy local part
        // never backtracks: a match starting anywhere in [i, j)
        // exists iff the run ends exactly at an '@' — one check
        // covers every start in the run (the skip's exactness)
        if (j < L && s.charAt(j) == '@') {
          val hs = j + 1
          var he = hs
          while (he < L && isHostC(s.charAt(he))) he += 1
          // greedy-host backtracking picks the LAST dot (index > hs,
          // so >=1 host char precedes) followed by >=2 alphas; the
          // {2,} tail then extends greedily along the alpha run
          var d = -1
          var k = he - 1
          while (k > hs && d < 0) {
            if (s.charAt(k) == '.' && k + 2 < L &&
                isAlpha(s.charAt(k + 1)) && isAlpha(s.charAt(k + 2)))
              d = k
            k -= 1
          }
          if (d >= 0) {
            var e = d + 1
            while (e < L && isAlpha(s.charAt(e))) e += 1
            sb.append("<EMAIL>")
            n += 1
            i = e
          } else {
            // host failed for every start inside the run (same '@',
            // same host run) — copy through the '@' and rescan from
            // the host region (its chars are not all local-class)
            sb.append(s, i, j + 1)
            i = j + 1
          }
        } else {
          sb.append(s, i, j)
          i = j
        }
      } else {
        sb.append(s.charAt(i))
        i += 1
      }
    }
    (sb.toString, n)
  }

  private[functions] def piiIpPass(s: String): (String, Long) = {
    val sb = new java.lang.StringBuilder(s.length)
    var n = 0L; var i = 0; val L = s.length
    while (i < L) {
      val c = s.charAt(i)
      if (isDigit(c) && (i == 0 || !isWordC(s.charAt(i - 1)))) {
        // attempt: 4 maximal digit runs of length 1-3 joined by '.',
        // then a right word-boundary. '.' never sits inside a digit
        // run, so octet backtracking can never succeed when the full
        // run fails — taking the whole run is exact
        var ok = true; var p = i; var oct = 0
        while (ok && oct < 4) {
          var q = p
          while (q < L && isDigit(s.charAt(q))) q += 1
          if (q - p < 1 || q - p > 3) ok = false
          else {
            p = q
            if (oct < 3) {
              if (p < L && s.charAt(p) == '.') p += 1 else ok = false
            }
          }
          oct += 1
        }
        if (ok && (p >= L || !isWordC(s.charAt(p)))) {
          sb.append("<IP>")
          n += 1
          i = p
        } else {
          // starts inside the first digit run all fail \b — skip it
          var q = i
          while (q < L && isDigit(s.charAt(q))) q += 1
          sb.append(s, i, q)
          i = q
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    (sb.toString, n)
  }

  private[functions] def piiPhonePass(s: String): (String, Long) = {
    val sb = new java.lang.StringBuilder(s.length)
    var n = 0L; var i = 0; val L = s.length
    while (i < L) {
      val c = s.charAt(i)
      if (c == '+') {
        var q = i + 1
        while (q < L && isDigit(s.charAt(q))) q += 1
        val run = q - (i + 1)
        if (run >= 7) {
          // no boundary in the pattern: greedy {7,15} takes
          // min(run, 15) digits and the match simply ends there
          val take = math.min(run, 15)
          sb.append("<PHONE>")
          n += 1
          i = i + 1 + take
        } else {
          sb.append(c)
          i += 1
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    (sb.toString, n)
  }

  def piiScan(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (t1, nEmail) = piiEmailPass(text.toString)
    val (t2, nIp) = piiIpPass(t1)
    val (t3, nPhone) = piiPhonePass(t2)
    org.apache.spark.sql.catalyst.InternalRow(
      nEmail, nIp, nPhone, UTF8String.fromString(t3))
  }

  /** L99: winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD '03 — the MOSS local fingerprinting scheme). One pass:
    * (1) polynomial rolling hash of every character k-gram over
    * Unicode CODE POINTS, base 31 mod 1e9+7 — the L11/q_fingerprint
    * scheme, so the SQL twin replays each gram with the same
    * list_reduce; (2) sliding-window minima of width w via a
    * monotonic deque (O(n), not O(n·w)); (3) the distinct minima,
    * sorted ascending. Guarantee: any substring match of length
    * ≥ w + k − 1 contributes at least one whole window to both
    * sides, so the docs share that window's minimum VALUE — the
    * fingerprint set detects it (no hash collisions assumed beyond
    * the rolling hash itself). Texts shorter than k hash whole
    * (1 gram); fewer than w grams form one window; empty text → [].
    * Ties inside a window pick the same VALUE regardless of
    * position, so the positional "rightmost-min" rule of the paper
    * (which only de-duplicates positions) is irrelevant to the
    * value-set this returns. */
  def winnowFps(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val sl = s.length
    var nCp = 0
    var ci = 0
    while (ci < sl) { nCp += 1; ci += Character.charCount(s.codePointAt(ci)) }
    if (nCp == 0) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](nCp)
    ci = 0; var cj = 0
    while (ci < sl) {
      val cp = s.codePointAt(ci); cps(cj) = cp; cj += 1
      ci += Character.charCount(cp)
    }
    val M = 1000000007L
    val grams: Array[Long] =
      if (nCp < k) {
        var h = 0L; var p = 0
        while (p < nCp) { h = (h * 31 + cps(p)) % M; p += 1 }
        Array(h)
      } else {
        val g = new Array[Long](nCp - k + 1)
        var pw = 1L; var t = 0
        while (t < k - 1) { pw = pw * 31 % M; t += 1 }
        var h = 0L; var p = 0
        while (p < k) { h = (h * 31 + cps(p)) % M; p += 1 }
        g(0) = h
        var q = k
        while (q < nCp) {
          h = (((h - cps(q - k) * pw % M + M) % M) * 31 + cps(q)) % M
          g(q - k + 1) = h
          q += 1
        }
        g
      }
    val ng = grams.length
    val set = new java.util.HashSet[java.lang.Long]()
    if (ng <= w) {
      var mn = grams(0); var p = 1
      while (p < ng) { if (grams(p) < mn) mn = grams(p); p += 1 }
      set.add(mn)
    } else {
      // monotonic deque of indices, values increasing front→back
      val dq = new Array[Int](ng)
      var head = 0; var tail = 0 // [head, tail)
      var p = 0
      while (p < ng) {
        while (tail > head && grams(dq(tail - 1)) >= grams(p)) tail -= 1
        dq(tail) = p; tail += 1
        if (dq(head) <= p - w) head += 1
        if (p >= w - 1) set.add(grams(dq(head)))
        p += 1
      }
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** L99d: POSITIONAL winnowing — the [[winnowFps]] selection with the
    * paper's rightmost-min tie rule, recording (fp, pos) anchors
    * (pos = 0-based codepoint index of the selected gram's start).
    * Consecutive windows re-selecting the same anchor collapse (the
    * standard de-dup), then distinct anchors sort by (pos, fp). The
    * rightmost rule matters HERE (it de-duplicates positions within
    * equal runs); the value-set of [[winnowFps]] is tie-rule-
    * independent by construction. Returns a flat [fp0, pos0, fp1,
    * pos1, …] long array (pair-struct arrays cost a codegen'd
    * object per element). */
  def winnowSpans(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val sl = s.length
    var nCp = 0
    var ci = 0
    while (ci < sl) { nCp += 1; ci += Character.charCount(s.codePointAt(ci)) }
    if (nCp == 0) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](nCp)
    ci = 0; var cj = 0
    while (ci < sl) {
      val cp = s.codePointAt(ci); cps(cj) = cp; cj += 1
      ci += Character.charCount(cp)
    }
    val M = 1000000007L
    val grams: Array[Long] =
      if (nCp < k) {
        var h = 0L; var p = 0
        while (p < nCp) { h = (h * 31 + cps(p)) % M; p += 1 }
        Array(h)
      } else {
        val g = new Array[Long](nCp - k + 1)
        var pw = 1L; var t = 0
        while (t < k - 1) { pw = pw * 31 % M; t += 1 }
        var h = 0L; var p = 0
        while (p < k) { h = (h * 31 + cps(p)) % M; p += 1 }
        g(0) = h
        var q = k
        while (q < nCp) {
          h = (((h - cps(q - k) * pw % M + M) % M) * 31 + cps(q)) % M
          g(q - k + 1) = h
          q += 1
        }
        g
      }
    val ng = grams.length
    // (fp, pos) pairs packed as longs, distinct via a set keyed on pos
    // (a position selects exactly one fp)
    val sel = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    if (ng <= w) {
      var mn = grams(0); var mi = 0; var p = 1
      while (p < ng) { if (grams(p) <= mn) { mn = grams(p); mi = p }; p += 1 }
      sel.put(mi.toLong, mn)
    } else {
      val dq = new Array[Int](ng)
      var head = 0; var tail = 0
      var p = 0
      while (p < ng) {
        while (tail > head && grams(dq(tail - 1)) >= grams(p)) tail -= 1
        dq(tail) = p; tail += 1
        if (dq(head) <= p - w) head += 1
        if (p >= w - 1) sel.put(dq(head).toLong, grams(dq(head)))
        p += 1
      }
    }
    val out = new Array[Long](sel.size() * 2)
    val it = sel.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = e.getValue; out(o + 1) = e.getKey
      o += 2
    }
    new GenericArrayData(out)
  }

  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 && m == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val av = a.toDoubleArray(); val bv = b.toDoubleArray()
    var s = 0.0
    var i = 0
    val n = math.min(av.length, bv.length)
    while (i < n) { s += av(i) * bv(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val av = a.toDoubleArray(); val bv = b.toDoubleArray()
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(av.length, bv.length)
    while (i < n) { s += av(i) * bv(i); na += av(i) * av(i); nb += bv(i) * bv(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else s / math.sqrt(na * nb)
  }

  /** Sorted distinct n-gram shingle ids straight from token hashes:
    * each window of n token FNVs folds into one id (order-sensitive
    * xor-multiply chain), so no shingle string is ever materialized.
    * Distinctness matches string shingles w.h.p. (same collision
    * assumption as every FNV set here). Mirrors `shingles()`: fewer
    * than n tokens → one whole-text shingle. */
  def shingleIdSet(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = fnv64(tokens.getUTF8String(i)); i += 1 }
    val count = if (m < n) 1 else m - n + 1
    val sh = new Array[Long](count)
    if (m < n) {
      var h = FnvOffset
      var j = 0
      while (j < m) { h = (h ^ th(j)) * FnvPrime; j += 1 }
      sh(0) = h
    } else {
      var s = 0
      while (s < count) {
        var h = FnvOffset
        var j = 0
        while (j < n) { h = (h ^ th(s + j)) * FnvPrime; j += 1 }
        sh(s) = h
        s += 1
      }
    }
    java.util.Arrays.sort(sh)
    var w = 0
    var r = 0
    while (r < sh.length) {
      if (w == 0 || sh(w - 1) != sh(r)) { sh(w) = sh(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, w))
  }

  /** Count of the most frequent ADJACENT token pair (bigram) — the
    * Gopher-style top-bigram repetition signal, O(tokens) via pair
    * hashing instead of the O(tokens²) generic array formulation.
    * Counts match the string-bigram computation w.h.p. (same FNV
    * collision assumption as every hashed set here). 0 if < 2 tokens. */
  def maxAdjacentPairCount(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    if (n < 2) return 0
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = fnv64(tokens.getUTF8String(i)); i += 1 }
    val counts = new java.util.HashMap[Long, Int](n * 2)
    var best = 0
    i = 0
    while (i < n - 1) {
      val pair = (th(i) ^ (th(i + 1) * FnvPrime)) * FnvPrime
      val c = counts.merge(pair, 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Hilbert-curve distance of a 2-D cell (the xy2d walk: per-bit
    * quadrant pick + rotate). Inputs in [0, 2^bits); bits <= 31.
    * Unlike the Morton interleave, consecutive distances are always
    * ADJACENT cells, so a range-partitioned sort bounds each file to a
    * compact blob instead of Z's corner jumps — tighter per-file
    * min/max on both dimensions at the same file count. The oracle
    * replays the identical walk as chained per-bit CTEs
    * (AnalyticsQueries.hilbertCteSql) — keep in LOCKSTEP. */
  def hilbertD2(x: Long, y: Long, bits: Int): Long = {
    var xx = x; var yy = y
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((xx & s) > 0) 1L else 0L
      val ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * (if (rx == 0) ry else 3L - ry) // (3·rx) xor ry
      if (ry == 0) {
        if (rx == 1) { xx = s - 1 - xx; yy = s - 1 - yy }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }

  /** 3-D Hilbert-curve distance via the Skilling transform (John
    * Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
    * 2004 — public algorithm): undo-rotation sweep over quadrant
    * levels, Gray encode, parity correction, then MSB-first bit
    * interleave of the transposed coordinates. Inputs in [0, 2^bits);
    * 3·bits <= 62. Same locality contract as [[hilbertD2]] in three
    * dimensions; the oracle replays the identical XOR/AND walk as
    * per-level CTEs — keep in LOCKSTEP. */
  def hilbertD3(x: Long, y: Long, z: Long, bits: Int): Long = {
    val X = Array(x, y, z)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    X(1) ^= X(0); X(2) ^= X(1)
    var t2 = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((X(2) & q) != 0) t2 ^= q - 1; q >>= 1 }
    var i = 0
    while (i < 3) { X(i) ^= t2; i += 1 }
    // interleave MSB-first: bit b of X(i) lands at 3·b + (2 − i)
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < 3) { h = (h << 1) | ((X(i) >> b) & 1L); i += 1 }
      b -= 1
    }
    h
  }

  /** Index of the max-cosine centroid (ties → lowest index) — the
    * map-side IVF cell assignment: one call per row against a small
    * literal centroid table, zero shuffle. */
  def nearestCentroid(vec: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    var best = 0
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val s = cosine(vec, cents.getArray(i))
      if (s > bestSim) { bestSim = s; best = i }
      i += 1
    }
    best
  }

  /** Top-n centroid indices by cosine (desc, index-asc ties) — the
    * query-side nProbe cell selection. Selection scan: C is small. */
  def topCentroids(vec: ArrayData, cents: ArrayData, nProbe: Int): ArrayData = {
    val n = cents.numElements()
    val sims = new Array[Double](n)
    var i = 0
    while (i < n) { sims(i) = cosine(vec, cents.getArray(i)); i += 1 }
    val k = math.min(nProbe, n)
    val out = new Array[Int](k)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < k) {
      // best == -1 seeds with the first unused index, so an all-NaN
      // similarity row (NaN beats nothing) still selects
      // deterministically (lowest indices) instead of writing used(-1).
      var best = -1
      var bestSim = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!used(i) && (best == -1 || sims(i) > bestSim)) { bestSim = sims(i); best = i }
        i += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Feature-hashed bag of words (Weinberger et al.): each token's
    * rolling hash picks a bucket in [0, d) and a +/-1 sign; the vector
    * is the signed count per bucket. Uses rollingHash (not FNV) so the
    * per-bucket integer weights are reproducible in the SQL oracle via
    * the same list_reduce recurrence as the fingerprint query. Returns
    * UNNORMALIZED weights — exact integers, engine-portable; normalize
    * downstream where cosine needs it (cosine is scale-invariant). */
  def hashedBow(tokens: ArrayData, d: Int): ArrayData = {
    val acc = new Array[Double](d)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = rollingHash(tokens.getUTF8String(i))
      val b = (h % d).toInt
      val sign = if ((h / d) % 2 == 0) 1.0 else -1.0
      acc(b) += sign
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Index of the min-L2-distance centroid (ties → lowest index) — the
    * product-quantization sub-cell assignment. PQ approximates INNER
    * PRODUCTS, so sub-codebooks must minimize L2 reconstruction error
    * (cosine assignment would ignore subvector magnitude). */
  def nearestCentroidL2(vec: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    val v = vec.toDoubleArray()
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < n) {
      val c = cents.getArray(i)
      var d = 0.0
      var j = 0
      while (j < v.length) {
        val x = v(j) - c.getDouble(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** [[nearestCentroidL2]] with the winning DISTANCE alongside:
    * returns [cluster, dist] as integral doubles (both exact — see
    * topCentroidsL2's integer-in-double argument). One kernel call
    * instead of an assignment pass plus per-centroid dot products;
    * callers referencing both outputs pay ≤ 2 kernel evaluations per
    * row under CollapseProject — bounded and map-side, unlike the
    * chain re-evaluation this family of fused kernels exists to
    * avoid. */
  def nearestCentroidDistL2(vec: ArrayData, cents: ArrayData): ArrayData = {
    val n = cents.numElements()
    val v = vec.toDoubleArray()
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < n) {
      val c = cents.getArray(i)
      var d = 0.0
      var j = 0
      while (j < v.length) {
        val x = v(j) - c.getDouble(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    new GenericArrayData(Array(best.toDouble, bestD))
  }

  /** Top-n centroid indices by SQUARED L2 distance (asc, index-asc
    * ties) — the query-side probe selection of the quantized IVF path.
    * Over integer-valued doubles every distance is exact (products and
    * sums of integers < 2^53 are exact in IEEE double), so the probe
    * ORDER — not just the set — replays bit-identically in any engine:
    * this is what lets the whole IVF chain carry a hash oracle. */
  def topCentroidsL2(vec: ArrayData, cents: ArrayData, nProbe: Int): ArrayData = {
    val n = cents.numElements()
    val v = vec.toDoubleArray()
    val ds = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = cents.getArray(i)
      var d = 0.0
      var j = 0
      while (j < v.length) { val x = v(j) - c.getDouble(j); d += x * x; j += 1 }
      ds(i) = d
      i += 1
    }
    val k = math.min(nProbe, n)
    val out = new Array[Int](k)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < k) {
      var best = -1
      var bestD = Double.PositiveInfinity
      i = 0
      while (i < n) {
        if (!used(i) && (best == -1 || ds(i) < bestD)) { bestD = ds(i); best = i }
        i += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: split `vec` into `m = books.numElements()` subspaces of
    * dsub = len/m dims; emit per subspace the index of the L2-nearest
    * row of that subspace's codebook block (a flat ksub×dsub array).
    * The m small codes REPLACE the vector in the scan: at d=64 float64
    * and m=8 that is a 64× read-volume cut on the candidate scan. */
  def pqEncode(vec: ArrayData, books: ArrayData): ArrayData = {
    val m = books.numElements()
    val v = vec.toDoubleArray()
    if (m == 0 || v.length < m) return new GenericArrayData(new Array[Int](0))
    val dsub = v.length / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val block = books.getArray(s)
      val ksub = block.numElements() / dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val x = v(s * dsub + j) - block.getDouble(c * dsub + j)
          d += x * x; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Query-side ADC distance table: dot(q_sub, centroid) for every
    * (subspace, code) cell, flattened m×ksub — computed ONCE per query,
    * then every candidate scores via m lookups in [[pqAdc]]. */
  def pqDtable(qvec: ArrayData, books: ArrayData): ArrayData = {
    val m = books.numElements()
    val q = qvec.toDoubleArray()
    if (m == 0 || q.length < m) return new GenericArrayData(new Array[Double](0))
    val dsub = q.length / m
    val ksub = books.getArray(0).numElements() / dsub
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val block = books.getArray(s)
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          acc += q(s * dsub + j) * block.getDouble(c * dsub + j); j += 1
        }
        out(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: sum over subspaces of dtable[s*ksub + codes[s]] — the
    * approximate inner product of the query with the RECONSTRUCTED
    * candidate, m array lookups per candidate, no vector read. */
  def pqAdc(codes: ArrayData, dtable: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val ksub = dtable.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) { acc += dtable.getDouble(s * ksub + codes.getInt(s)); s += 1 }
    acc
  }

  /** Sign bits against k pseudo-random hyperplanes (splitmix64-derived,
    * component weights in [-1,1)) — random-hyperplane LSH bucket id.
    * Seed packs (plane, component) into disjoint long halves so plane
    * j's weight stream never re-enters plane j+1's at any embedding
    * dimension (the old `j*8192+i` scheme aliased beyond d=8192). */
  /** The (bits × dim) hyperplane weight matrix behind
    * [[hyperplaneLsh]]/[[hyperplaneProbes]] — the same per-(j, i)
    * splitmix weights, exported so the DuckDB oracle builder can embed
    * them as double literals and replay the bucketing bit-exactly
    * (shortest-repr doubles round-trip through both parsers). */
  private[graft] def hyperplaneWeights(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, i) =>
      mix(0x5851f42d4c957f2dL * ((j.toLong << 32) | (i.toLong + 1L)))
        .toDouble / Long.MaxValue.toDouble
    }

  def hyperplaneLsh(a: ArrayData, k: Int): Long = {
    require(k >= 1 && k <= 64, s"hyperplane_lsh needs 1 <= bits <= 64, got $k")
    val av = a.toDoubleArray()
    var out = 0L
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < av.length) {
        val w = mix(0x5851f42d4c957f2dL * ((j.toLong << 32) | (i.toLong + 1L)))
        acc += av(i) * (w.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (acc >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Fused character-distribution statistics in ONE pass over the
    * text's Unicode CODE POINTS (the engine's portable character rule
    * — UTF-16 `length()` diverges from DuckDB's codepoint semantics
    * on astral-plane text, the L54 lesson): returns
    * [n_cp, n_distinct_cp, sum_sq(Σ count²), max_count].
    * Σ count² is the unnormalized collision mass behind the Simpson
    * index — the RATIONAL concentration surrogate for character
    * entropy (Rényi order 2), chosen because Shannon entropy needs a
    * libm log that no cross-engine oracle can replay exactly while
    * floor(Σc²·10⁶/n²) is pure integer arithmetic. High concentration
    * = single-character floods / binary-noise runs; near-uniform =
    * healthy prose. ASCII counts land in a flat 128-slot array (the
    * common corpus allocates no map); non-ASCII spills to a boxed map
    * only when present. */
  def charDistStats(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, Array[Long]] = null
    var nCp = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nCp += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Array[Long]]()
        val k = Integer.valueOf(cp)
        val slot = wide.get(k)
        if (slot == null) wide.put(k, Array(1L)) else slot(0) += 1
      }
      i += Character.charCount(cp)
    }
    var nd = 0L; var ss = 0L; var mx = 0L
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) { nd += 1; ss += k * k; if (k > mx) mx = k }
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        nd += 1; ss += k * k; if (k > mx) mx = k
      }
    }
    new GenericArrayData(Array(nCp, nd, ss, mx))
  }

  /** Fused Gopher-rule statistics in ONE pass over the text — the
    * codegen replacement for eight interpreted higher-order passes
    * (filter/transform/aggregate lambdas are CodegenFallback in
    * Spark). Token semantics replicate `tokenize_ws` (split on ' ',
    * empties dropped) and line semantics `split(text, "\n")` with
    * trailing empties kept, so the flags built on these stats are
    * bit-identical to the builtin composition (spec-gated parity).
    * Returns [n_words, sum_wordlen(codepoints), n_alpha_words,
    * n_symbol_words(== "#" or ends "..."), n_distinct_stops_present,
    * n_lines, n_bullet_lines, n_ellipsis_lines]. */
  def gopherStats(text: UTF8String, stops: ArrayData): ArrayData = {
    val s = text.toString
    val n = s.length
    val nStops = stops.numElements()
    val stopStrs = new Array[String](nStops)
    var t = 0
    while (t < nStops) { stopStrs(t) = stops.getUTF8String(t).toString; t += 1 }
    val seen = new Array[Boolean](nStops)
    var nWords = 0L; var sumLen = 0L; var alpha = 0L; var sym = 0L
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) {
        nWords += 1
        sumLen += s.codePointCount(i, j)
        var hasAlpha = false
        var k = i
        while (k < j && !hasAlpha) {
          val c = s.charAt(k)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
          k += 1
        }
        if (hasAlpha) alpha += 1
        if (j - i == 1 && s.charAt(i) == '#') sym += 1
        else if (j - i >= 3 && s.charAt(j - 1) == '.' &&
          s.charAt(j - 2) == '.' && s.charAt(j - 3) == '.') sym += 1
        var si = 0
        while (si < nStops) {
          if (!seen(si) && stopStrs(si).length == j - i &&
            s.regionMatches(i, stopStrs(si), 0, j - i)) seen(si) = true
          si += 1
        }
      }
      i = j + 1
    }
    var stopsPresent = 0L
    t = 0
    while (t < nStops) { if (seen(t)) stopsPresent += 1; t += 1 }
    // line stats: segments of split(text, "\n") with trailing empties
    var nl = 0L; var bullet = 0L; var ell = 0L
    var st = 0
    var p = 0
    while (p <= n) {
      if (p == n || s.charAt(p) == '\n') {
        nl += 1
        if (p > st) {
          val c0 = s.charAt(st)
          if (c0 == '-' || c0 == '*') bullet += 1
          if (p - st >= 3 && s.charAt(p - 1) == '.' &&
            s.charAt(p - 2) == '.' && s.charAt(p - 3) == '.') ell += 1
        }
        st = p + 1
      }
      p += 1
    }
    new GenericArrayData(Array(nWords, sumLen, alpha, sym, stopsPresent,
      nl, bullet, ell))
  }

  /** Fused blocklist statistics in ONE pass over the text:
    * [n_tokens, n_hits, n_distinct_hits] with O(1) membership against
    * a prebuilt term set — the codegen replacement for the
    * higher-order composition, which is CodegenFallback AND
    * O(tokens · |blocklist|) per row (real CPU once the published
    * O(10³)-term lists are in play). Token semantics replicate
    * `tokenize_ws` (split on ' ', empties dropped). The distinct-hit
    * set allocates only when a hit occurs (the common clean doc
    * allocates nothing). */
  def blocklistStats(text: UTF8String,
                     terms: java.util.HashSet[String]): ArrayData = {
    val s = text.toString
    val n = s.length
    var nTok = 0L; var nHits = 0L
    var distinct: java.util.HashSet[String] = null
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) {
        nTok += 1
        val w = s.substring(i, j)
        if (terms.contains(w)) {
          nHits += 1
          if (distinct == null) distinct = new java.util.HashSet[String]()
          distinct.add(w)
        }
      }
      i = j + 1
    }
    val nd = if (distinct == null) 0L else distinct.size.toLong
    new GenericArrayData(Array(nTok, nHits, nd))
  }

  /** Fused multi-list marker counting in ONE pass over the text:
    * counts(k) = number of whitespace tokens contained in list k.
    * The codegen replacement for the per-list
    * `size(filter(tokenize_ws(text), isin(...)))` HOF chain, which is
    * CodegenFallback AND O(tokens · Σ|list|) with per-element boxing —
    * it sat in every lang-id, stopword-ratio and quality-score hot
    * path. One token walk, ONE hash probe per token against a
    * token→list-bitmask map (built once per executor). Token
    * semantics replicate `tokenize_ws` (split on ' ', empties
    * dropped); membership is exact string equality — values are
    * bit-identical to the HOF chain, so every downstream oracle is
    * untouched. */
  def markerCounts(text: UTF8String,
                   masks: java.util.HashMap[String, java.lang.Long],
                   nLists: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val counts = new Array[Long](nLists)
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) {
        val mask = masks.get(s.substring(i, j))
        if (mask != null) {
          var b = mask.longValue()
          var k = 0
          while (b != 0L) {
            if ((b & 1L) == 1L) counts(k) += 1
            b >>>= 1
            k += 1
          }
        }
      }
      i = j + 1
    }
    new GenericArrayData(counts)
  }

  /** Fused overlapping token-window chunking in ONE pass: windows of
    * `chunkTokens` tokens every `chunkTokens - overlap` tokens, each
    * emitted as (chunk_idx, chunk_text, n_chunk_tokens). Replicates
    * the composed-builtins formula exactly — nChunks =
    * max(1, ceil((nTok - overlap) / stride)), final short window kept
    * — so swapping it in changes no query value; the HOF composition
    * (transform over sequence with a slice + concat_ws per element)
    * is CodegenFallback and re-walks the token array per chunk. */
  def chunkWindows(text: UTF8String, chunkTokens: Int,
                   overlap: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    // token boundaries (split on ' ', empties dropped)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) { starts.add(i); ends.add(j) }
      i = j + 1
    }
    val nTok = starts.size
    val stride = chunkTokens - overlap
    val nChunks = math.max(1L,
      math.floor((nTok - overlap + stride - 1).toDouble / stride).toLong)
    val out = new Array[AnyRef](nChunks.toInt)
    var c = 0
    while (c < nChunks) {
      val from = c * stride
      val until = math.min(nTok, from + chunkTokens)
      val sb = new java.lang.StringBuilder()
      var t = from
      while (t < until) {
        if (t > from) sb.append(' ')
        sb.append(s, starts.get(t), ends.get(t))
        t += 1
      }
      val len = math.max(0, until - from).toLong
      out(c) = org.apache.spark.sql.catalyst.InternalRow(
        c.toLong, UTF8String.fromString(sb.toString), len)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Seeded deterministic word dropout in ONE pass: the 1-based
    * token at position p of the document keyed `key` drops iff
    * rollingHash("key:p:seed") mod 1000 < dropPm. A pure function of
    * (key, position, seed): re-runs, task retries and engines agree
    * on every view, and epoch-varying views come from varying seed —
    * rand()-based augmentation breaks all three. Returns
    * (aug_text, n_tokens, n_dropped). */
  def dropoutTokens(text: UTF8String, key: UTF8String, dropPm: Int,
                    seed: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val k = key.toString
    val sb = new java.lang.StringBuilder()
    var nTok = 0L
    var nDrop = 0L
    var i = 0
    val n = s.length
    while (i <= n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) {
        nTok += 1
        val h = rollingHash(UTF8String.fromString(k + ":" + nTok + ":" + seed))
        if (h % 1000 < dropPm) nDrop += 1
        else {
          if (sb.length > 0) sb.append(' ')
          sb.append(s, i, j)
        }
      }
      i = j + 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(sb.toString), nTok, nDrop)
  }

  /** Unicode NFC normalization (canonical composition) — the
    * pre-hashing step every dedup/fingerprint pipeline needs: "é" as
    * U+00E9 and as e+U+0301 are the same text but different bytes, so
    * un-normalized corpora under-dedup and double-count vocabulary.
    * JDK `java.text.Normalizer` (no external lib); ASCII fast-path
    * skips the normalizer entirely (the overwhelmingly common case
    * costs one byte scan). DuckDB's `nfc_normalize` implements the
    * same canonical composition, so the op carries a hash oracle. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val bytes = text.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < bytes) {
      if ((text.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) text
    else {
      val s = text.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  /** Multi-probe buckets (Lv et al., "Multi-Probe LSH", VLDB 2007,
    * first-order perturbations): probe 0 is the [[hyperplaneLsh]] home
    * bucket, probe i flips the bit whose hyperplane margin |acc_j| is
    * i-th SMALLEST (ties by plane index) — the neighboring buckets a
    * near-boundary vector's true neighbors most likely landed in.
    * Same plane weights as hyperplaneLsh, so a multi-probe query is
    * compatible with a corpus bucketed by the single-probe kernel. */
  def hyperplaneProbes(a: ArrayData, k: Int, nProbe: Int): ArrayData = {
    require(k >= 1 && k <= 64, s"hyperplane_probes needs 1 <= bits <= 64, got $k")
    require(nProbe >= 1 && nProbe <= k + 1,
      s"hyperplane_probes needs 1 <= nProbe <= bits + 1, got $nProbe")
    val av = a.toDoubleArray()
    val margins = new Array[Double](k)
    var base = 0L
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < av.length) {
        val w = mix(0x5851f42d4c957f2dL * ((j.toLong << 32) | (i.toLong + 1L)))
        acc += av(i) * (w.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (acc >= 0) base |= (1L << j)
      margins(j) = math.abs(acc)
      j += 1
    }
    val order = (0 until k).sortBy(j => (margins(j), j))
    val out = new Array[Long](nProbe)
    out(0) = base
    var p = 1
    while (p < nProbe) { out(p) = base ^ (1L << order(p - 1)); p += 1 }
    new GenericArrayData(out)
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(v: Any): Any = Kernels.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any = Kernels.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

case class MinHashBandHashes(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && k % bands == 0,
    s"minhash_band_hashes: bands ($bands) must divide k ($k)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"
  override def nullSafeEval(v: Any): Any =
    Kernels.minhashBandHashes(v.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.minhashBandHashes($c, $k, $bands)")
  override protected def withNewChildInternal(c: Expression): MinHashBandHashes =
    copy(child = c)
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(v: Any): Any = Kernels.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

case class TokenizeWs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_ws"
  override def nullSafeEval(v: Any): Any =
    Kernels.tokenizeWs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.tokenizeWs($c)")
  override protected def withNewChildInternal(c: Expression): TokenizeWs = copy(c)
}

case class TokenIdSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_id_set"
  override def nullSafeEval(v: Any): Any =
    Kernels.tokenIdSet(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.tokenIdSet($c)")
  override protected def withNewChildInternal(c: Expression): TokenIdSet = copy(c)
}

case class QuantizeQ16(child: Expression)
    extends UnaryExpression with NumericVectorInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_q16"
  override def nullSafeEval(v: Any): Any =
    Kernels.quantizeQ16(v.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.quantizeQ16($c, $isFloat)")
  override protected def withNewChildInternal(c: Expression): QuantizeQ16 = copy(c)
}

/** Analysis-time input guard for kernels that read their array child
  * through float/double getters: any other element type (array<int>,
  * array<string>, …) would be read as raw numeric words and silently
  * return garbage, so it must FAIL ANALYSIS instead. Null elements are
  * read as 0.0 — accepted (parquet array schemas are element-nullable
  * by default even when no nulls exist) and documented, not silent. */
trait NumericVectorInput { self: UnaryExpression =>
  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got " +
            other.catalogString)
    }
}

case class JlProjectQ16(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression with NumericVectorInput {
  require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
    s"jl_project_q16 needs 1 <= outDim <= inDim, got $inDim -> $outDim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project_q16"
  override def nullSafeEval(v: Any): Any =
    Kernels.jlProjectQ16(v.asInstanceOf[ArrayData], isFloat, inDim, outDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.jlProjectQ16($c, $isFloat, $inDim, $outDim)")
  override protected def withNewChildInternal(c: Expression): JlProjectQ16 =
    copy(child = c)
}

case class CastDoubleArray(child: Expression)
    extends UnaryExpression with NumericVectorInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "as_double_array"
  override def nullSafeEval(v: Any): Any =
    Kernels.castDoubleArray(v.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.castDoubleArray($c, $isFloat)")
  override protected def withNewChildInternal(c: Expression): CastDoubleArray = copy(c)
}

case class L2Norm(child: Expression)
    extends UnaryExpression with NumericVectorInput {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"
  override def nullSafeEval(v: Any): Any =
    Kernels.l2Norm(v.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.l2Norm($c, $isFloat)")
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
}

case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"
  override def nullSafeEval(v: Any): Any =
    Kernels.shingleStrings(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleStrings($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleStrings = copy(child = c)
}

case class LuhnValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_valid"
  override def nullSafeEval(v: Any): Any =
    Kernels.luhnValid(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.luhnValid($c)")
  override protected def withNewChildInternal(c: Expression): LuhnValid = copy(c)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class HyperplaneLsh(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_lsh"
  override def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneLsh(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hyperplaneLsh($c, $k)")
  override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
}

/** Fused one-pass Gopher-rule statistics — see Kernels.gopherStats. */
case class GopherStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_stats"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.gopherStats(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.gopherStats($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GopherStats =
    copy(left = l, right = r)
}

/** Unicode NFC canonical composition — see Kernels.nfcNormalize. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(v: Any): Any =
    Kernels.nfcNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(c)
}

/** Fused one-pass character-distribution statistics — see
  * Kernels.charDistStats. */
case class CharDistStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_dist_stats"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Kernels.charDistStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.charDistStats($c)")
  override protected def withNewChildInternal(c: Expression): CharDistStats =
    copy(c)
}

/** Fused one-pass blocklist statistics with a plan-embedded term set
  * (built once per executor, O(1) membership) — see
  * Kernels.blocklistStats. */
case class BlocklistStats(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_stats"
  @transient private lazy val termSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    terms.foreach(s.add)
    s
  }
  override def nullSafeEval(v: Any): Any =
    Kernels.blocklistStats(v.asInstanceOf[UTF8String], termSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: the codegen backend (Janino) does not parse generics
    val setRef = ctx.addReferenceObj("blockTerms", termSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.blocklistStats($c, $setRef)")
  }
  override protected def withNewChildInternal(c: Expression): BlocklistStats =
    copy(child = c)
}

/** Fused multi-list marker counts with a plan-embedded
  * token→list-bitmask map (built once per executor, one probe per
  * token) — see Kernels.markerCounts. Bounded at 64 lists by the
  * bitmask width. */
case class MarkerCounts(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {
  require(lists.nonEmpty && lists.size <= 64,
    s"marker_counts needs 1..64 lists, got ${lists.size}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "marker_counts"
  @transient private lazy val masks: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    lists.zipWithIndex.foreach { case (terms, k) =>
      terms.foreach { t =>
        val prev = m.get(t)
        m.put(t, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << k)))
      }
    }
    m
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Kernels.markerCounts(v.asInstanceOf[UTF8String], masks, lists.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: the codegen backend (Janino) does not parse generics
    val mref = ctx.addReferenceObj("markerMasks", masks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.markerCounts($c, $mref, ${lists.size})")
  }
  override protected def withNewChildInternal(c: Expression): MarkerCounts =
    copy(child = c)
}

/** Seeded deterministic word dropout — see Kernels.dropoutTokens. */
case class DropoutTokens(left: Expression, right: Expression,
                         dropPm: Int, seed: Long)
    extends BinaryExpression {
  require(dropPm >= 0 && dropPm <= 1000,
    s"dropout_tokens needs 0 <= dropPm <= 1000, got $dropPm")
  override def dataType: DataType = StructType(Seq(
    StructField("aug_text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false)))
  override def prettyName: String = "dropout_tokens"
  override def nullSafeEval(t: Any, k: Any): Any =
    Kernels.dropoutTokens(t.asInstanceOf[UTF8String],
      k.asInstanceOf[UTF8String], dropPm, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k) => s"graft.functions.Kernels.dropoutTokens($t, $k, $dropPm, ${seed}L)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DropoutTokens =
    copy(left = l, right = r)
}

/** Fused token-window chunking — see Kernels.chunkWindows. */
case class ChunkWindows(child: Expression, chunkTokens: Int, overlap: Int)
    extends UnaryExpression {
  require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
    s"chunk_windows needs 0 <= overlap < chunkTokens, got $chunkTokens/$overlap")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_chunk_tokens", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "chunk_windows"
  override def nullSafeEval(v: Any): Any =
    Kernels.chunkWindows(v.asInstanceOf[UTF8String], chunkTokens, overlap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.chunkWindows($c, $chunkTokens, $overlap)")
  override protected def withNewChildInternal(c: Expression): ChunkWindows =
    copy(child = c)
}

/** Multi-probe bucket list for a query vector — see
  * Kernels.hyperplaneProbes. */
case class HyperplaneProbes(child: Expression, k: Int, nProbe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_probes"
  override def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneProbes(v.asInstanceOf[ArrayData], k, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hyperplaneProbes($c, $k, $nProbe)")
  override protected def withNewChildInternal(c: Expression): HyperplaneProbes = copy(child = c)
}

/** Sorted distinct n-gram shingle ids from a token array — see
  * Kernels.shingleIdSet. */
case class ShingleIdSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_id_set"
  override def nullSafeEval(v: Any): Any =
    Kernels.shingleIdSet(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleIdSet($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleIdSet = copy(child = c)
}

/** Map-side IVF cell assignment: argmax-cosine centroid index of `left`
  * (array<double>) against `right`, a small literal/broadcast
  * array<array<double>> centroid table. */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.nearestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.nearestCentroid($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

/** PQ sub-cell assignment: argmin-L2 centroid index of `left` against
  * `right` (small literal/broadcast array<array<double>>). */
case class NearestCentroidL2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_l2"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.nearestCentroidL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.nearestCentroidL2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroidL2 =
    copy(left = l, right = r)
}

case class NearestCentroidDistL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "nearest_centroid_dist_l2"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.nearestCentroidDistL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Kernels.nearestCentroidDistL2($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroidDistL2 =
    copy(left = l, right = r)
}

/** Map-side PQ encoding of `left` (array<double>) against `right`, the
  * m-block codebook table — see Kernels.pqEncode. */
case class PqEncode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.pqEncode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.pqEncode($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** Per-query ADC lookup table of `left` (query vector) against `right`
  * (codebook table) — see Kernels.pqDtable. */
case class PqDtable(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_dtable"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.pqDtable(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.pqDtable($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqDtable =
    copy(left = l, right = r)
}

/** ADC score of `left` (codes) against `right` (a query's distance
  * table) — see Kernels.pqAdc. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.pqAdc($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** Query-side nProbe cell selection: top-`nProbe` centroid indices of
  * `left` against the centroid table `right`, by cosine desc. */
case class TopCentroids(left: Expression, right: Expression, nProbe: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroids"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.topCentroids(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.topCentroids($a, $b, $nProbe)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopCentroids =
    copy(left = l, right = r)
}

/** Hilbert-curve distance of two bucketized dimensions — see
  * Kernels.hilbertD2. */
case class HilbertD2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d2"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hilbertD2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hilbertD2($a, $b, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertD2 =
    copy(left = l, right = r)
}

/** 3-D Hilbert-curve distance (Skilling transform) — see
  * Kernels.hilbertD3. */
case class HilbertD3(first: Expression, second: Expression,
                     third: Expression, bits: Int)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d3"
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Kernels.hilbertD3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.Kernels.hilbertD3($a, $b, $c, $bits)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HilbertD3 =
    copy(first = f, second = s, third = t)
}

/** Query-side nProbe cell selection by squared-L2 distance (asc,
  * index-asc ties) — exact over integer-valued doubles, so the probe
  * order is engine-replayable (see Kernels.topCentroidsL2). */
case class TopCentroidsL2(left: Expression, right: Expression, nProbe: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroids_l2"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.topCentroidsL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.topCentroidsL2($a, $b, $nProbe)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopCentroidsL2 =
    copy(left = l, right = r)
}

/** Feature-hashed bag-of-words vector — see Kernels.hashedBow. */
case class HashedBow(child: Expression, d: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_bow"
  override def nullSafeEval(v: Any): Any =
    Kernels.hashedBow(v.asInstanceOf[ArrayData], d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hashedBow($c, $d)")
  override protected def withNewChildInternal(c: Expression): HashedBow = copy(child = c)
}

/** Count of the most frequent adjacent token pair — see
  * Kernels.maxAdjacentPairCount. */
case class MaxAdjacentPairCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_adjacent_pair_count"
  override def nullSafeEval(v: Any): Any =
    Kernels.maxAdjacentPairCount(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.maxAdjacentPairCount($c)")
  override protected def withNewChildInternal(c: Expression): MaxAdjacentPairCount =
    copy(c)
}

case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"
  override def nullSafeEval(v: Any): Any = Kernels.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.fnv64($c)")
  override protected def withNewChildInternal(c: Expression): Fnv64 = copy(c)
}

/** Exact intersection size of two SORTED distinct long arrays, with
  * the PPJoin suffix-style early abort: returns -1 the moment
  * inter-so-far + min(remaining) drops below `minInter` — the
  * can't-reach-the-required-overlap bound (Xiao et al. WWW'08) applied
  * ONLINE during the merge, so sub-threshold pairs (the vast majority
  * after candidate generation) stop scanning early instead of paying
  * the full intersect + a post-hoc filter. Callers filter on
  * `result >= minInter`, so -1 and the true sub-threshold count are
  * interchangeable; passing pairs get the exact count. */
case class InterGeSorted(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "inter_ge_sorted"
  override def nullSafeEval(a: Any, b: Any, h: Any): Any =
    Kernels.interGeSorted(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, h) => s"graft.functions.Kernels.interGeSorted($a, $b, $h)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): InterGeSorted =
    copy(first = f, second = s, third = t)
}

/** Fused one-pass secret/credential token scan — see
  * [[Kernels.secretScan]]. */
case class SecretScan(child: Expression, minLen: Int, maxSimpsonPpm: Long)
    extends UnaryExpression {
  require(minLen >= 1 && maxSimpsonPpm >= 1 && maxSimpsonPpm <= 1000000L,
    s"secret_scan needs minLen >= 1 and maxSimpsonPpm in [1, 1e6], " +
      s"got $minLen/$maxSimpsonPpm")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_secrets", LongType, nullable = false),
    StructField("n_masked_cp", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def prettyName: String = "secret_scan"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Kernels.secretScan(v.asInstanceOf[UTF8String], minLen, maxSimpsonPpm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.secretScan($c, $minLen, ${maxSimpsonPpm}L)")
  override protected def withNewChildInternal(c: Expression): SecretScan =
    copy(child = c)
}

/** Fused three-stage structured-PII scan — see [[Kernels.piiScan]]. */
case class PiiScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_email", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def prettyName: String = "pii_scan"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Kernels.piiScan(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.piiScan($c)")
  override protected def withNewChildInternal(c: Expression): PiiScan =
    copy(child = c)
}

/** Winnowing fingerprint set (sorted distinct window-min k-gram
  * hashes) — see [[Kernels.winnowFps]]. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1,
    s"winnow_fps needs k >= 1 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Kernels.winnowFps(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnowFps($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFps =
    copy(child = c)
}

/** Positional winnowing anchors, flat [fp, pos, …] longs — see
  * [[Kernels.winnowSpans]]. */
case class WinnowSpans(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1,
    s"winnow_spans needs k >= 1 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_spans"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Kernels.winnowSpans(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.winnowSpans($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowSpans =
    copy(child = c)
}

/** Jaccard similarity of two SORTED long arrays via a single merge
  * pass — the verification kernel for near-dup pairs. ~100ns/pair vs
  * ~10us for generic array_intersect/array_union on string arrays. */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
}
