package graft.core

import scala.collection.mutable.ArrayBuffer

/** Polygon boolean overlay: intersection / union / difference / symmetric
  * difference over POLYGON and MULTIPOLYGON (XY, holes supported), plus
  * the N-ARY union [[unionAll]] (the dissolve aggregate's engine — every
  * operand in one sweep instead of a log-k cascade).
  *
  * Algorithm: a Martínez–Rueda-style plane sweep (Martínez, Rueda, Feito,
  * "A new algorithm for computing Boolean operations on polygons",
  * Computers & Geosciences 2009) for SUBDIVISION — splitting every edge
  * at its intersections and folding coincident cross-operand bundles —
  * but labeling and reconnection of our own design:
  *
  *  - labeling is WINDING-COVER COUNTING, not the paper's inOut flag
  *    pairs: each edge carries an exact per-channel toggle (±1, derived
  *    from the input ring's signed area + shell/hole position — no
  *    floating-point sweep state), and a SECOND sweep pass — run after
  *    all divisions and folds are final, so nothing it reads can go
  *    stale — accumulates the cover counts below each edge on the x+ε
  *    evaluation line (verticals never cross that line: they skip the
  *    chain, and their own deltas classify their west/east sides). The
  *    paper's flag propagation mislabels vertex-on-edge stacks next to
  *    vertical edges (observed: all four ops crashed on a triangle whose
  *    corner lies on the other operand's edge); integer cover counting
  *    with final-state evaluation has no such order sensitivity.
  *  - evaluating the operation on each edge's two side-memberships
  *    selects boundary edges and directs them so the result interior is
  *    on their LEFT;
  *  - rings are then extracted by planar face traversal: at each vertex
  *    the walk continues onto the first outgoing edge CLOCKWISE from the
  *    reversed incoming direction. This provably pairs edge wedges of the
  *    same face, so crossing vertices (degree 4+) never weld two faces
  *    into one self-touching "bowtie" ring — the failure mode of the
  *    published algorithm's position-ordered reconnection for XOR.
  *
  * Shells come out CCW and holes CW by construction; hole→shell parentage
  * is assigned by even-odd containment of a hole vertex against the
  * smallest enclosing shell.
  *
  * Determinism and oracle-ability:
  *  - intersection points snap to exact input ordinates whenever a segment
  *    is axis-parallel (a vertical edge forces the exact x, a horizontal
  *    edge the exact y), so axis-aligned fixtures (q129/q130) produce
  *    bit-exact corner coordinates with NO floating-point residue;
  *  - output rings are canonicalized: shells CCW, holes CW, every ring
  *    rotated to start at its lexicographically smallest vertex, holes
  *    sorted within their polygon, polygons sorted by smallest shell
  *    vertex — the result is a pure function of the input VALUE, not of
  *    traversal order.
  *
  * Scope (documented, PostGIS-compatible subset):
  *  - polygon × polygon (and MULTI): all four operations; inputs must be
  *    valid (first ring = shell, rest holes; no self-overlapping edges —
  *    detected overlaps within one operand throw);
  *  - point/multipoint × polygon and linestring/multilinestring × polygon:
  *    intersection and difference (clip / anti-clip); union/xor of mixed
  *    dimensionality would yield GEOMETRYCOLLECTION and is rejected;
  *  - XY only (overlay Z interpolation across two inputs is undefined);
  *  - dimensional collapse is dropped: overlaps of zero area (shared
  *    edges, corner touches) yield POLYGON EMPTY, as does any zero-area
  *    result ring. A hole touching its shell at one point comes out as a
  *    single self-touching ring (even-odd equivalent).
  */
object Overlay {

  final val OpIntersection = 0
  final val OpUnion = 1
  final val OpDifference = 2
  final val OpXor = 3

  /** Hard cap on sweep events — a 100-TB guard against adversarial inputs
    * whose subdivision would explode (quadratic intersection counts). */
  final val MaxEvents: Int = 1 << 24

  // =====================================================================
  // public entry points
  // =====================================================================

  def intersection(a: Geom, b: Geom): Geom = dispatch(a, b, OpIntersection)
  def union(a: Geom, b: Geom): Geom = dispatch(a, b, OpUnion)
  def difference(a: Geom, b: Geom): Geom = dispatch(a, b, OpDifference)
  def symDifference(a: Geom, b: Geom): Geom = dispatch(a, b, OpXor)

  private def isPoly(g: Geom): Boolean =
    g.geomType == GeomTypes.Polygon || g.geomType == GeomTypes.MultiPolygon
  private def isLine(g: Geom): Boolean =
    g.geomType == GeomTypes.LineString || g.geomType == GeomTypes.MultiLineString
  private def isPoint(g: Geom): Boolean =
    g.geomType == GeomTypes.Point || g.geomType == GeomTypes.MultiPoint

  private def dispatch(a: Geom, b: Geom, op: Int): Geom = {
    require(a.dims == Dims.XY && b.dims == Dims.XY,
      "overlay supports XY geometries only (Z/M overlay interpolation is undefined)")
    if (isPoly(a) && isPoly(b)) return boolOp(a, b, op)
    // lower-dimension × polygon: clip semantics for intersection/difference
    op match {
      case OpIntersection =>
        if (isLine(a) && isPoly(b)) lineClip(a, b, keepInside = true)
        else if (isPoly(a) && isLine(b)) lineClip(b, a, keepInside = true)
        else if (isPoint(a) && isPoly(b)) pointClip(a, b, keepInside = true)
        else if (isPoly(a) && isPoint(b)) pointClip(b, a, keepInside = true)
        else unsupported(a, b, "st_intersection")
      case OpDifference =>
        if (isLine(a) && isPoly(b)) lineClip(a, b, keepInside = false)
        else if (isPoint(a) && isPoly(b)) pointClip(a, b, keepInside = false)
        else unsupported(a, b, "st_difference")
      case _ => unsupported(a, b,
        if (op == OpUnion) "st_union" else "st_symdifference")
    }
  }

  private def unsupported(a: Geom, b: Geom, fn: String): Nothing =
    throw new IllegalArgumentException(
      s"$fn: unsupported type combination ${GeomTypes.name(a.geomType)} × " +
        s"${GeomTypes.name(b.geomType)}")

  // =====================================================================
  // polygon × polygon boolean core
  // =====================================================================

  def boolOp(subject: Geom, clipping: Geom, op: Int): Geom = {
    val srid = subject.srid
    val subjEmpty = subject.isEmpty
    val clipEmpty = clipping.isEmpty
    if (subjEmpty && clipEmpty) return emptyPolygon(srid)
    if (subjEmpty) return op match {
      case OpIntersection | OpDifference => emptyPolygon(srid)
      case _ => normalizeCopy(clipping)
    }
    if (clipEmpty) return op match {
      case OpIntersection => emptyPolygon(srid)
      case _ => normalizeCopy(subject)
    }

    val queue = new java.util.PriorityQueue[Ev](64, EvOrdering)
    var nEvents = addPolyEvents(subject, operand = 0, chan = 0, queue, 0)
    nEvents = addPolyEvents(clipping, operand = 1, chan = 1, queue, nEvents)

    val lefts = sweep(queue, nEvents)
    buildFromEdges(lefts, coverDir(_, op), srid)
  }

  /** Union of MANY polygons in ONE sweep (the dissolve aggregate's
    * engine): instead of a log-k cascade of binary unions — each
    * materializing and re-sweeping its intermediate result — every ring
    * of every operand enters a single subdivision sweep that maintains a
    * COVER COUNT (how many operand polygons contain the region), and an
    * edge is a result boundary iff the cover is zero on exactly one of
    * its sides. Deltas come from the EXACT per-ring orientation
    * (`ownLeft`), never from floating-point sweep state.
    *
    * Cover-chain soundness: the chain is evaluated on the x+ε line, which
    * VERTICAL edges (in status only at exactly x) never cross — so
    * verticals contribute nothing to the chain, and after subdivision no
    * edge crosses a vertical piece's interior, making the chain value at
    * a vertical its EAST-side cover (its own west→east delta recovers the
    * west side). Coincident cross-operand bundles fold their deltas into
    * the status-lowest edge (idempotent — folded edges zero out).
    *
    * Output is the same canonical form as the binary ops. Operand list
    * order only breaks comparator ties, so for exact-arithmetic inputs
    * the result VALUE is order-invariant; [[graft.sql.GeoOps.unionGeoms]]
    * canonical-sorts operands first, which pins even tie order. */
  def unionAll(geoms: Seq[Geom]): Geom = {
    // indexed access: a List operand sequence would make the loop below
    // O(n²) in length/apply alone (observed as a hang at 250k operands)
    val nonEmpty = geoms.iterator.filter(!_.isEmpty).toArray
    if (nonEmpty.isEmpty)
      return emptyPolygon(if (geoms.isEmpty) 0 else geoms.head.srid)
    if (nonEmpty.length == 1) return normalizeCopy(nonEmpty.head)
    val srid = nonEmpty.head.srid
    val queue = new java.util.PriorityQueue[Ev](64, EvOrdering)
    var nEvents = 0
    var gi = 0
    while (gi < nonEmpty.length) {
      require(nonEmpty(gi).dims == Dims.XY,
        "overlay supports XY geometries only (Z/M overlay interpolation is undefined)")
      nEvents = addPolyEvents(nonEmpty(gi), operand = gi,
        chan = 0, queue, nEvents)
      gi += 1
    }
    val lefts = sweep(queue, nEvents)
    // everything on the subject channel: union membership = count > 0
    buildFromEdges(lefts, coverDir(_, OpUnion), srid)
  }

  /** Subdivision + fold sweep shared by the binary ops and [[unionAll]].
    * NO labeling happens here: a later coincident fold mutates deltas
    * BELOW already-labeled edges, so any insertion-time chain value can
    * go stale (this exact staleness — and the published algorithm's
    * vertical-edge flag fragility around vertex-on-edge stacks — were
    * both observed as dangling-result-graph failures before the split).
    * The covers come from [[coverPass]] AFTER subdivision+folding is
    * final. Returns all left events. */
  private def sweep(queue: java.util.PriorityQueue[Ev],
                    nEvents: Int): ArrayBuffer[Ev] = {
    val status = new java.util.TreeSet[Ev](SegOrdering)
    val lefts = new ArrayBuffer[Ev](math.max(nEvents / 2, 8))
    while (!queue.isEmpty) {
      val event = queue.poll()
      require(lefts.length < MaxEvents, "overlay: subdivision too large")
      if (event.left) {
        lefts += event
        status.add(event)
        val prev = status.lower(event)
        val next = status.higher(event)
        if (next != null) possibleIntersection(event, next, queue)
        if (prev != null) possibleIntersection(prev, event, queue)
      } else {
        val left = event.other
        val prev = status.lower(left)
        val next = status.higher(left)
        if (!status.remove(left)) {
          // comparator drift (a division mutated a neighbor's right cap
          // while this segment sat in the tree): fall back to identity scan
          val it = status.iterator()
          var removed = false
          while (it.hasNext && !removed) {
            if (it.next() eq left) { it.remove(); removed = true }
          }
        }
        if (prev != null && next != null) possibleIntersection(prev, next, queue)
      }
    }
    coverPass(lefts)
    lefts
  }

  /** Second pass: with every division and delta fold FINAL, re-run the
    * sweep order over the final segments and fill the cover chains —
    * no stale reads possible. No geometry changes here (all crossings
    * are already subdivided; coincident bundles already folded), so the
    * pass is pure bookkeeping at O(E log E). */
  private def coverPass(lefts: ArrayBuffer[Ev]): Unit = {
    val queue = new java.util.PriorityQueue[Ev](
      math.max(lefts.length * 2, 8), EvOrdering)
    var i = 0
    while (i < lefts.length) {
      queue.add(lefts(i)); queue.add(lefts(i).other)
      i += 1
    }
    val status = new java.util.TreeSet[Ev](SegOrdering)
    while (!queue.isEmpty) {
      val event = queue.poll()
      if (event.left) {
        status.add(event)
        coverFields(event, status.lower(event))
      } else {
        val left = event.other
        if (!status.remove(left)) {
          val it = status.iterator()
          var removed = false
          while (it.hasNext && !removed) {
            if (it.next() eq left) { it.remove(); removed = true }
          }
        }
      }
    }
  }

  // =====================================================================
  // sweep event machinery
  // =====================================================================

  private val nextEvId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `operand`: which input polygon the edge belongs to — 0/1 for the
    * binary ops (subject/clipping), the list index for [[unionAll]];
    * overlap WITHIN one operand is invalid input in both modes.
    * `chan`: which cover channel the edge's delta toggles — 0 = subject,
    * 1 = clipping for binary; all 0 for unionAll. */
  private final class Ev(val x: Double, val y: Double,
                         val operand: Int, val chan: Int) {
    var left: Boolean = false
    var other: Ev = _
    /** own-polygon interior side relative to the left→right sweep
      * direction of this edge — EXACT, derived from the input ring. */
    var ownLeft: Boolean = false
    /** Winding-count contribution per channel: crossing the edge upward
      * (non-vertical) / west→east (vertical) changes that channel's
      * cover by this much; coincident bundles fold their deltas into
      * the status-lowest edge (the folded-out members zero). */
    var dSubj: Int = 0
    var dClip: Int = 0
    /** Cover per channel of the region the chain evaluates just below
      * this edge on the x+ε line (for a vertical edge: its east side).
      * Filled by [[coverPass]] AFTER subdivision+folding is final. */
    var bSubj: Int = 0
    var bClip: Int = 0
    /** The bundle-bottom edge this coincident edge's deltas were folded
      * into (null = not folded). Folding must be TRANSITIVE into the one
      * bundle bottom — spreading deltas across members makes the
      * fictional inter-bundle covers non-monotone (mixed-sign bundles
      * would select several directed edges for one physical boundary and
      * leave the result graph unbalanced). */
    var foldRoot: Ev = _
    def folded: Boolean = foldRoot != null
    val id: Long = nextEvId.getAndIncrement()

    def isVertical: Boolean = x == other.x
    def samePoint(e: Ev): Boolean = x == e.x && y == e.y
    /** true when this event's SEGMENT lies below point (px,py). */
    def segBelow(px: Double, py: Double): Boolean =
      if (left) signedArea(x, y, other.x, other.y, px, py) > 0
      else signedArea(other.x, other.y, x, y, px, py) > 0
    def segAbove(px: Double, py: Double): Boolean = !segBelow(px, py)
  }

  private def signedArea(x0: Double, y0: Double, x1: Double, y1: Double,
                         x2: Double, y2: Double): Double =
    (x0 - x2) * (y1 - y2) - (x1 - x2) * (y0 - y2)

  /** One closed ring [from,until) of coord indices (last vertex repeats
    * the first). `isHole`: the ring's own-polygon interior is OUTSIDE
    * the ring (valid-input assumption: first ring shell, rest holes).
    * Returns the updated event count (hard-capped at [[MaxEvents]]). */
  private def addRingEvents(g: Geom, from: Int, until: Int,
                            operand: Int, chan: Int, isHole: Boolean,
                            queue: java.util.PriorityQueue[Ev],
                            nEvents0: Int): Int = {
    val s = g.stride
    // ring signed area decides which traversal side the ring interior
    // is on; zero-area rings contribute no region and are skipped
    var area2 = 0.0
    var k = from
    while (k < until - 1) {
      val x0 = g.coords(k * s); val y0 = g.coords(k * s + 1)
      val x1 = g.coords((k + 1) * s); val y1 = g.coords((k + 1) * s + 1)
      area2 += x0 * y1 - x1 * y0
      k += 1
    }
    if (area2 == 0.0) return nEvents0
    val ringInteriorLeft = area2 > 0.0 // CCW: enclosed area left of travel
    val ownLeftOrig = if (isHole) !ringInteriorLeft else ringInteriorLeft
    var nEvents = nEvents0
    var i = from
    while (i < until - 1) {
      val x0 = g.coords(i * s); val y0 = g.coords(i * s + 1)
      val x1 = g.coords((i + 1) * s); val y1 = g.coords((i + 1) * s + 1)
      if (!(x0 == x1 && y0 == y1)) { // skip degenerate zero-length edges
        val e1 = new Ev(x0, y0, operand, chan)
        val e2 = new Ev(x1, y1, operand, chan)
        e1.other = e2; e2.other = e1
        val forward = x0 < x1 || (x0 == x1 && y0 < y1)
        if (forward) e1.left = true else e2.left = true
        // own-interior side relative to the LEFT→RIGHT sweep direction
        // (for a vertical edge: relative to UPWARD travel, i.e. west)
        val ownLeft = if (forward) ownLeftOrig else !ownLeftOrig
        e1.ownLeft = ownLeft; e2.ownLeft = ownLeft
        // cover delta: non-vertical edges toggle crossing UPWARD
        // (+1 iff interior above = ownLeft); vertical edges toggle
        // crossing WEST→EAST (+1 iff interior east = !ownLeft)
        val d = if (x0 == x1) { if (ownLeft) -1 else 1 }
                else { if (ownLeft) 1 else -1 }
        if (chan == 0) { e1.dSubj = d; e2.dSubj = d }
        else { e1.dClip = d; e2.dClip = d }
        queue.add(e1); queue.add(e2)
        nEvents += 2
        require(nEvents < MaxEvents, "overlay: input too large")
      }
      i += 1
    }
    nEvents
  }

  private def addPolyEvents(g: Geom, operand: Int, chan: Int,
                            queue: java.util.PriorityQueue[Ev],
                            nEvents0: Int): Int = {
    var nEvents = nEvents0
    g.geomType match {
      case GeomTypes.Polygon =>
        var r = 0
        while (r < g.o0.length - 1) {
          nEvents = addRingEvents(g, g.o0(r), g.o0(r + 1), operand,
            chan, isHole = r > 0, queue, nEvents)
          r += 1
        }
      case GeomTypes.MultiPolygon =>
        var p = 0
        while (p < g.o0.length - 1) {
          var r = g.o0(p)
          while (r < g.o0(p + 1)) {
            nEvents = addRingEvents(g, g.o1(r), g.o1(r + 1), operand,
              chan, isHole = r > g.o0(p), queue, nEvents)
            r += 1
          }
          p += 1
        }
      case _ => throw new IllegalArgumentException(
        s"overlay operand must be POLYGON/MULTIPOLYGON, got ${GeomTypes.name(g.geomType)}")
    }
    nEvents
  }

  /** Sweep processing order: x, then y, then right-before-left at the same
    * point, then bottom segment first; collinear ties: subject first. */
  private def cmpEv(a: Ev, b: Ev): Int = {
    if (a eq b) return 0
    if (a.x != b.x) return java.lang.Double.compare(a.x, b.x)
    if (a.y != b.y) return java.lang.Double.compare(a.y, b.y)
    if (a.left != b.left) return if (a.left) 1 else -1
    val sa = signedArea(a.x, a.y, a.other.x, a.other.y, b.other.x, b.other.y)
    if (sa != 0.0) return if (a.segBelow(b.other.x, b.other.y)) -1 else 1
    if (a.operand != b.operand) return Integer.compare(a.operand, b.operand)
    java.lang.Long.compare(a.id, b.id)
  }

  private object EvOrdering extends java.util.Comparator[Ev] {
    def compare(a: Ev, b: Ev): Int = cmpEv(a, b)
  }

  /** Sweep-line status order: below-to-above at the current sweep
    * position. Both arguments are left events. */
  private object SegOrdering extends java.util.Comparator[Ev] {
    def compare(a: Ev, b: Ev): Int = {
      if (a eq b) return 0
      val s1 = signedArea(a.x, a.y, a.other.x, a.other.y, b.x, b.y)
      val s2 = signedArea(a.x, a.y, a.other.x, a.other.y, b.other.x, b.other.y)
      if (s1 != 0.0 || s2 != 0.0) {
        // not collinear
        if (a.samePoint(b)) // same left endpoint: order by right endpoint
          return if (a.segBelow(b.other.x, b.other.y)) -1 else 1
        if (cmpEv(a, b) > 0) // b was inserted first
          return if (b.segAbove(a.x, a.y)) -1 else 1
        return if (a.segBelow(b.x, b.y)) -1 else 1
      }
      // collinear segments
      if (a.operand == b.operand) return java.lang.Long.compare(a.id, b.id)
      Integer.compare(a.operand, b.operand)
    }
  }

  /** Cover chain (both modes): per channel, the winding count just below
    * `e` on the x+ε evaluation line = the value just below `prev` plus
    * `prev`'s toggles — EXCEPT vertical prevs, which exist only at
    * exactly x and never cross the x+ε line (their deltas are west→east
    * toggles, used only for their own side classification). Folded-out
    * coincident edges carry zero deltas, so the chain walks through
    * bundles unchanged. Valid operands make every count non-negative
    * (shell +1 / hole -1 nesting), so membership is `count > 0`. */
  private def coverFields(e: Ev, prev: Ev): Unit =
    if (prev == null) {
      e.bSubj = 0; e.bClip = 0
    } else if (prev.isVertical) {
      e.bSubj = prev.bSubj; e.bClip = prev.bClip
    } else {
      e.bSubj = prev.bSubj + prev.dSubj
      e.bClip = prev.bClip + prev.dClip
    }

  private def opCombine(op: Int, s: Boolean, c: Boolean): Boolean =
    op match {
      case OpIntersection => s && c
      case OpUnion => s || c
      case OpXor => s != c
      case OpDifference => s && !c
    }

  /** Result selection (both modes): evaluate the op on the channel
    * memberships of the edge's two sides; boundary iff they differ,
    * directed so the result interior is on the LEFT of the stored
    * traversal (left→right for non-verticals — left = above;
    * bottom→top for verticals — left = west; the chain value at a
    * vertical is its EAST side, its own deltas recover the west). */
  private def coverDir(e: Ev, op: Int): Int = {
    if (e.folded) return 0 // deltas live on its bundle root
    val (sLeft, cLeft, sRight, cRight) =
      if (e.isVertical)
        (e.bSubj - e.dSubj, e.bClip - e.dClip, e.bSubj, e.bClip)
      else
        (e.bSubj + e.dSubj, e.bClip + e.dClip, e.bSubj, e.bClip)
    val inL = opCombine(op, sLeft > 0, cLeft > 0)
    val inR = opCombine(op, sRight > 0, cRight > 0)
    if (inL == inR) 0 else if (inL) 1 else -1
  }

  /** Split [se, se.other] at (px,py): right cap for the left piece plus a
    * fresh left event for the right piece, both queued. */
  private def divideSegment(se: Ev, px: Double, py: Double,
                            queue: java.util.PriorityQueue[Ev]): Unit = {
    val r = new Ev(px, py, se.operand, se.chan)
    r.other = se
    r.ownLeft = se.ownLeft
    r.dSubj = se.dSubj; r.dClip = se.dClip
    val l = new Ev(px, py, se.operand, se.chan)
    l.left = true
    l.other = se.other
    l.ownLeft = se.ownLeft
    l.dSubj = se.dSubj; l.dClip = se.dClip
    // foldRoot deliberately NOT copied: the far piece of a divided
    // folded edge is no longer coincident (folding only happens on
    // exactly-equal spans); if it still is, the sweep re-detects and
    // re-folds when the two pieces become status neighbors
    // rounding guard: the split point must not sort after the original
    // right endpoint; if FP noise makes it, flip the piece's polarity
    if (cmpEv(l, se.other) > 0) {
      se.other.left = true
      l.left = false
    }
    se.other.other = l
    se.other = r
    queue.add(l)
    queue.add(r)
  }

  /** Detect and handle the intersection of two adjacent status edges
    * (`e1` must be the status-LOWER of the pair — the fold target walk
    * relies on it). Returns 0 (none/shared endpoint only), 1 (proper
    * crossing, segments divided), 2 (overlap starting at a shared left
    * endpoint — deltas folded), 3 (other overlap shapes). */
  private def possibleIntersection(e1: Ev, e2: Ev,
                                   queue: java.util.PriorityQueue[Ev]): Int = {
    val inter = segmentIntersection(
      e1.x, e1.y, e1.other.x, e1.other.y,
      e2.x, e2.y, e2.other.x, e2.other.y)
    if (inter == null) return 0
    if (inter.length == 2) {
      // single intersection point
      val px = inter(0); val py = inter(1)
      // shared endpoint → nothing to divide
      if (e1.samePoint(e2) || e1.other.samePoint(e2.other)) return 0
      var divided = 0
      if (!(px == e1.x && py == e1.y) && !(px == e1.other.x && py == e1.other.y)) {
        divideSegment(e1, px, py, queue); divided += 1
      }
      if (!(px == e2.x && py == e2.y) && !(px == e2.other.x && py == e2.other.y)) {
        divideSegment(e2, px, py, queue); divided += 1
      }
      return if (divided > 0) 1 else 0
    }
    // collinear overlap
    if (e1.operand == e2.operand)
      throw new IllegalArgumentException(
        "overlay: input polygon has overlapping edges (invalid geometry)")
    val leftCoincide = e1.samePoint(e2)
    val rightCoincide = e1.other.samePoint(e2.other)
    val rights =
      if (rightCoincide) null
      else if (cmpEv(e1.other, e2.other) > 0) Array(e2.other, e1.other)
      else Array(e1.other, e2.other)

    if (leftCoincide) {
      // split the longer edge's tail FIRST (the tail keeps its pre-fold
      // deltas; invariant — a folded edge never extends beyond its
      // bundle span), then fold the exactly-coincident pair's cover
      // deltas TRANSITIVELY into the bundle-bottom edge. `foldRoot`
      // guards idempotence under re-detection, and a later-arriving
      // lower member inherits an upper root's accumulated totals.
      if (!rightCoincide)
        divideSegment(rights(1).other, rights(0).x, rights(0).y, queue)
      if (e2.foldRoot == null) {
        var root = e1
        while (root.foldRoot != null) root = root.foldRoot
        if (root ne e2) {
          // INVARIANT: a root's accumulated deltas describe its whole
          // current span uniformly — so spans must be EQUAL at fold
          // time. The transitive root may be longer than the pair's
          // coincident span (it collected an earlier, longer member)
          // or shorter (it was divided since): split the longer one
          // at the shorter's right end first. Divided tails keep the
          // pre-fold deltas they inherit, which is exactly their
          // uniform bundle total over the remaining span.
          val rx = root.other.x; val ry = root.other.y
          val ex = e2.other.x; val ey = e2.other.y
          if (!(rx == ex && ry == ey)) {
            val rootLonger = ex < rx || (ex == rx && ey < ry)
            if (rootLonger) divideSegment(root, ex, ey, queue)
            else divideSegment(e2, rx, ry, queue)
          }
          root.dSubj += e2.dSubj
          root.dClip += e2.dClip
          e2.dSubj = 0; e2.dClip = 0
          e2.foldRoot = root
        }
      }
      return 2
    }
    val lefts =
      if (cmpEv(e1, e2) > 0) Array(e2, e1)
      else Array(e1, e2)
    if (rightCoincide) {
      // share the right endpoint: split the earlier at the later's start
      divideSegment(lefts(0), lefts(1).x, lefts(1).y, queue)
      return 3
    }
    if (lefts(0) ne rights(1).other) {
      // partial overlap, neither contains the other
      divideSegment(lefts(0), lefts(1).x, lefts(1).y, queue)
      divideSegment(lefts(1), rights(0).x, rights(0).y, queue)
      return 3
    }
    // one segment fully contains the other
    divideSegment(lefts(0), lefts(1).x, lefts(1).y, queue)
    divideSegment(rights(1).other, rights(0).x, rights(0).y, queue)
    3
  }

  /** Segment × segment intersection. Returns null (none), a 2-element
    * array (one point) or a 4-element array (collinear overlap range).
    * Intersection ordinates snap to exact input coordinates whenever a
    * segment is axis-parallel — axis-aligned fixtures stay bit-exact. */
  private[core] def segmentIntersection(
      x0: Double, y0: Double, x1: Double, y1: Double,
      x2: Double, y2: Double, x3: Double, y3: Double): Array[Double] = {
    val dax = x1 - x0; val day = y1 - y0
    val dbx = x3 - x2; val dby = y3 - y2
    val ex = x2 - x0; val ey = y2 - y0
    val kross = dax * dby - day * dbx
    if (kross != 0.0) {
      val s = (ex * dby - ey * dbx) / kross
      if (s < 0.0 || s > 1.0) return null
      val t = (ex * day - ey * dax) / kross
      if (t < 0.0 || t > 1.0) return null
      // endpoint hits reproduce the endpoint exactly
      if (s == 0.0) return Array(x0, y0)
      if (s == 1.0) return Array(x1, y1)
      if (t == 0.0) return Array(x2, y2)
      if (t == 1.0) return Array(x3, y3)
      var px = x0 + s * dax
      var py = y0 + s * day
      // axis-parallel snap: a vertical edge pins x, a horizontal edge pins y
      if (x0 == x1) px = x0 else if (x2 == x3) px = x2
      if (y0 == y1) py = y0 else if (y2 == y3) py = y2
      return Array(px, py)
    }
    // parallel: collinear only when the cross of (e, da) vanishes
    if (ex * day - ey * dax != 0.0) return null
    // collinear: overlap range by lexicographic endpoint order
    def lt(ax: Double, ay: Double, bx: Double, by: Double): Boolean =
      ax < bx || (ax == bx && ay < by)
    var a0x = x0; var a0y = y0; var a1x = x1; var a1y = y1
    if (lt(a1x, a1y, a0x, a0y)) { val tx = a0x; val ty = a0y; a0x = a1x; a0y = a1y; a1x = tx; a1y = ty }
    var b0x = x2; var b0y = y2; var b1x = x3; var b1y = y3
    if (lt(b1x, b1y, b0x, b0y)) { val tx = b0x; val ty = b0y; b0x = b1x; b0y = b1y; b1x = tx; b1y = ty }
    // overlap = [max(a0,b0), min(a1,b1)]
    val (ox0, oy0) = if (lt(a0x, a0y, b0x, b0y)) (b0x, b0y) else (a0x, a0y)
    val (ox1, oy1) = if (lt(a1x, a1y, b1x, b1y)) (a1x, a1y) else (b1x, b1y)
    if (lt(ox1, oy1, ox0, oy0)) null
    else if (ox0 == ox1 && oy0 == oy1) Array(ox0, oy0)
    else Array(ox0, oy0, ox1, oy1)
  }

  // =====================================================================
  // ring extraction: planar face traversal, clockwise-first rule
  // =====================================================================

  private final class DEdge(val fx: Double, val fy: Double,
                            val tx: Double, val ty: Double) {
    var used: Boolean = false
    def dx: Double = tx - fx
    def dy: Double = ty - fy
  }

  /** Vertex identity for the face walk: the EXACT ordinate bit pair
    * (-0.0 normalized to +0.0 so coincident vertices share a key) — a
    * hashed long here would make two distinct vertices collide with
    * birthday probability and silently weld unrelated faces; the tuple
    * key makes equality exact and leaves hashing to the map. */
  private def vKey(x: Double, y: Double): (Long, Long) =
    (java.lang.Double.doubleToLongBits(x + 0.0),
      java.lang.Double.doubleToLongBits(y + 0.0))

  /** Among outgoing directions, pick the FIRST one rotating CLOCKWISE from
    * the reversed incoming direction (rx,ry) — the edge bounding the same
    * face as the incoming edge when every edge keeps its interior on the
    * left. Exact: comparisons use cross/dot signs only. */
  private def pickClockwise(rx: Double, ry: Double,
                            cands: ArrayBuffer[DEdge]): DEdge = {
    var best: DEdge = null
    var bestGroup = Int.MaxValue
    var i = 0
    while (i < cands.length) {
      val c = cands(i)
      if (!c.used) {
        val cross = rx * c.dy - ry * c.dx
        val dot = rx * c.dx + ry * c.dy
        // CW-from-reference ordering groups:
        //   0: cross<0           (strictly clockwise side, first)
        //   1: cross==0 && dot<0 (directly opposite)
        //   2: cross>0           (counterclockwise side)
        //   3: cross==0 && dot>0 (same direction as reference, last)
        val group =
          if (cross < 0.0) 0
          else if (cross == 0.0 && dot < 0.0) 1
          else if (cross > 0.0) 2
          else 3
        if (best == null || group < bestGroup ||
          (group == bestGroup && (group == 0 || group == 2) &&
            (c.dx * best.dy - c.dy * best.dx) < 0.0)) {
          // within a strict side group, c is earlier in clockwise order
          // than best iff cross(c, best) < 0 (best lies clockwise of c,
          // i.e. later); groups 1/3 hold at most one distinct direction
          best = c
          bestGroup = group
        }
      }
      i += 1
    }
    best
  }

  private def buildFromEdges(lefts: ArrayBuffer[Ev], dirOf: Ev => Int,
                             srid: Int): Geom = {
    // collect directed result edges, grouped by origin vertex
    val out = new java.util.HashMap[(Long, Long), ArrayBuffer[DEdge]]()
    val all = new ArrayBuffer[DEdge]()
    def add(fx: Double, fy: Double, tx: Double, ty: Double): Unit = {
      val e = new DEdge(fx, fy, tx, ty)
      all += e
      val k = vKey(fx, fy)
      var lst = out.get(k)
      if (lst == null) { lst = new ArrayBuffer[DEdge](4); out.put(k, lst) }
      lst += e
    }
    var i = 0
    while (i < lefts.length) {
      val e = lefts(i)
      dirOf(e) match {
        case 1 => add(e.x, e.y, e.other.x, e.other.y)
        case -1 => add(e.other.x, e.other.y, e.x, e.y)
        case _ => ()
      }
      i += 1
    }

    // walk faces. Closure is by VERTEX REPETITION with cycle-splitting:
    // returning to the walk's start vertex closes the ring; revisiting any
    // other vertex splits the enclosed loop off as its own ring (pinched
    // faces, FP sliver loops). Termination and non-stuckness follow from
    // per-vertex in/out degree balance: every arrival at a non-start
    // vertex leaves at least one unused outgoing edge.
    val rings = new ArrayBuffer[ArrayBuffer[Double]]()
    i = 0
    while (i < all.length) {
      val start = all(i)
      if (!start.used) {
        val ring = new ArrayBuffer[Double]()
        val seen = new java.util.HashMap[(Long, Long), Integer]()
        val k0 = vKey(start.fx, start.fy)
        ring += start.fx; ring += start.fy
        seen.put(k0, Integer.valueOf(0))
        var cur = start
        var open = true
        var steps = 0
        while (open) {
          steps += 1
          require(steps <= all.length + 1, "overlay: malformed result graph")
          cur.used = true
          val kv = vKey(cur.tx, cur.ty)
          if (kv == k0) {
            ring += cur.tx; ring += cur.ty // close on the start vertex
            rings += ring
            open = false
          } else {
            val prevIdx = seen.get(kv)
            if (prevIdx != null) {
              // loop back to an interior vertex: split the cycle off
              val at = prevIdx.intValue() * 2
              val sub = new ArrayBuffer[Double](ring.length - at + 2)
              var j = at
              while (j < ring.length) { sub += ring(j); j += 1 }
              sub += cur.tx; sub += cur.ty
              rings += sub
              var jj = at + 2
              while (jj < ring.length - 1) {
                seen.remove(vKey(ring(jj), ring(jj + 1)))
                jj += 2
              }
              ring.dropRightInPlace(ring.length - (at + 2))
            } else {
              seen.put(kv, Integer.valueOf(ring.length / 2))
              ring += cur.tx; ring += cur.ty
            }
            val cands = out.get(kv)
            require(cands != null, "overlay: dangling result edge")
            val nxt = pickClockwise(-cur.dx, -cur.dy, cands)
            require(nxt != null, "overlay: stuck result walk")
            cur = nxt
          }
        }
      }
      i += 1
    }
    assembleRings(rings, srid)
  }

  // =====================================================================
  // canonical geometry assembly
  // =====================================================================

  private def ringSignedArea2(pts: ArrayBuffer[Double], n: Int): Double = {
    var a = 0.0
    var i = 0
    var jx = pts((n - 1) * 2); var jy = pts((n - 1) * 2 + 1)
    while (i < n) {
      val ix = pts(i * 2); val iy = pts(i * 2 + 1)
      a += jx * iy - ix * jy
      jx = ix; jy = iy
      i += 1
    }
    a
  }

  /** Canonical CLOSED ring: rotated to the lexicographically smallest
    * vertex, oriented CCW for shells / CW for holes, first point repeated
    * at the end. Returns null for degenerate (<3 distinct points or zero
    * area) rings. */
  private def canonicalRing(ptsIn: ArrayBuffer[Double], ccw: Boolean): Array[Double] = {
    // drop the duplicated closing point(s) from the walk
    var n = ptsIn.length / 2
    while (n > 1 && ptsIn(0) == ptsIn((n - 1) * 2) &&
      ptsIn(1) == ptsIn((n - 1) * 2 + 1)) n -= 1
    if (n < 3) return null
    val area2 = ringSignedArea2(ptsIn, n)
    if (area2 == 0.0) return null
    val reverse = (area2 > 0.0) != ccw
    var minI = 0
    var i = 1
    while (i < n) {
      val x = ptsIn(i * 2); val y = ptsIn(i * 2 + 1)
      val mx = ptsIn(minI * 2); val my = ptsIn(minI * 2 + 1)
      if (x < mx || (x == mx && y < my)) minI = i
      i += 1
    }
    val out = new Array[Double]((n + 1) * 2)
    i = 0
    while (i < n) {
      val src = if (reverse) (minI - i + n) % n else (minI + i) % n
      out(i * 2) = ptsIn(src * 2)
      out(i * 2 + 1) = ptsIn(src * 2 + 1)
      i += 1
    }
    out(n * 2) = out(0)
    out(n * 2 + 1) = out(1)
    out
  }

  /** Even-odd ray cast of (x,y) against one CLOSED ring in a flat array. */
  private def ringContains(ring: Array[Double], x: Double, y: Double): Boolean = {
    val n = ring.length / 2 - 1 // closed: last repeats first
    var inside = false
    var i = 0
    var jx = ring((n - 1) * 2); var jy = ring((n - 1) * 2 + 1)
    while (i < n) {
      val ix = ring(i * 2); val iy = ring(i * 2 + 1)
      if ((iy > y) != (jy > y) &&
        x < (jx - ix) * (y - iy) / (jy - iy) + ix) inside = !inside
      jx = ix; jy = iy
      i += 1
    }
    inside
  }

  /** Assemble walked rings into canonical POLYGON/MULTIPOLYGON: ring
    * orientation from the walk (interior-left ⇒ shells CCW, holes CW),
    * hole parentage by smallest enclosing shell. */
  private def assembleRings(walked: ArrayBuffer[ArrayBuffer[Double]],
                            srid: Int): Geom = {
    val shells = new ArrayBuffer[Array[Double]]()
    val holes = new ArrayBuffer[Array[Double]]()
    walked.foreach { pts =>
      var n = pts.length / 2
      while (n > 1 && pts(0) == pts((n - 1) * 2) && pts(1) == pts((n - 1) * 2 + 1)) n -= 1
      if (n >= 3) {
        val a2 = ringSignedArea2(pts, n)
        if (a2 > 0.0) { val r = canonicalRing(pts, ccw = true); if (r != null) shells += r }
        else if (a2 < 0.0) { val r = canonicalRing(pts, ccw = false); if (r != null) holes += r }
      }
    }
    if (shells.isEmpty) return emptyPolygon(srid)

    def shellArea2(r: Array[Double]): Double = {
      var a = 0.0
      var i = 0
      val n = r.length / 2 - 1
      var jx = r((n - 1) * 2); var jy = r((n - 1) * 2 + 1)
      while (i < n) {
        a += jx * r(i * 2 + 1) - r(i * 2) * jy
        jx = r(i * 2); jy = r(i * 2 + 1)
        i += 1
      }
      math.abs(a)
    }
    val shellAreas = shells.map(shellArea2)
    val holesOf = Array.fill(shells.length)(new ArrayBuffer[Array[Double]]())
    holes.foreach { h =>
      // representative: the hole's first (lexicographically smallest) vertex
      val hx = h(0); val hy = h(1)
      var best = -1
      var bestArea = Double.MaxValue
      var siNdx = 0
      while (siNdx < shells.length) {
        if (shellAreas(siNdx) < bestArea && ringContains(shells(siNdx), hx, hy)) {
          best = siNdx; bestArea = shellAreas(siNdx)
        }
        siNdx += 1
      }
      if (best >= 0) holesOf(best) += h
      // a hole with no enclosing shell is degenerate output — drop it
    }

    final case class Poly(shell: Array[Double], hs: Array[Array[Double]])
    val polys = shells.indices.map { si =>
      Poly(shells(si), holesOf(si).toArray.sortWith { (a, b) =>
        a(0) < b(0) || (a(0) == b(0) && a(1) < b(1))
      })
    }.sortWith { (p, q) =>
      p.shell(0) < q.shell(0) || (p.shell(0) == q.shell(0) && p.shell(1) < q.shell(1))
    }

    if (polys.length == 1) {
      val p = polys(0)
      val rings = Array(p.shell) ++ p.hs
      val coords = rings.flatten
      val o0 = rings.scanLeft(0)((acc, r) => acc + r.length / 2)
      Geom(GeomTypes.Polygon, Dims.XY, coords, o0, Geom.emptyInts, null, srid)
    } else {
      val coords = new ArrayBuffer[Double]()
      val o0 = new ArrayBuffer[Int](); o0 += 0
      val o1 = new ArrayBuffer[Int](); o1 += 0
      polys.foreach { p =>
        val rings = Array(p.shell) ++ p.hs
        rings.foreach { r =>
          coords ++= r
          o1 += o1.last + r.length / 2
        }
        o0 += o0.last + rings.length
      }
      Geom(GeomTypes.MultiPolygon, Dims.XY, coords.toArray, o0.toArray,
        o1.toArray, null, srid)
    }
  }

  private def emptyPolygon(srid: Int): Geom =
    Geom(GeomTypes.Polygon, Dims.XY, Geom.emptyDoubles, Array(0),
      Geom.emptyInts, null, srid)

  /** Normalize a polygon/multipolygon VALUE through the same canonical
    * form the overlay emits (used for the empty-operand shortcuts so
    * `union(A, EMPTY)` equals `union(A, B_disjoint)`'s representation of
    * A). Rings are canonicalized directly, no sweep. */
  def normalizeCopy(g: Geom): Geom = {
    // same domain guard as dispatch — callers that shortcut straight
    // here (empty-operand paths, unionGeoms' singleton case) must not
    // silently drop Z/M where the two-operand path would throw
    require(g.dims == Dims.XY,
      "overlay supports XY geometries only (Z/M overlay interpolation is undefined)")
    val walked = new ArrayBuffer[ArrayBuffer[Double]]()
    def addRing(from: Int, until: Int, hole: Boolean): Unit = {
      val pts = new ArrayBuffer[Double]((until - from) * 2)
      var i = from
      while (i < until) {
        pts += g.coords(i * g.stride); pts += g.coords(i * g.stride + 1)
        i += 1
      }
      // orient like the walk output: shells CCW, holes CW
      var n = pts.length / 2
      while (n > 1 && pts(0) == pts((n - 1) * 2) && pts(1) == pts((n - 1) * 2 + 1)) n -= 1
      if (n >= 3) {
        val a2 = ringSignedArea2(pts, n)
        if (a2 != 0.0) {
          val needCcw = !hole
          if ((a2 > 0.0) != needCcw) {
            // reverse in place (keep first vertex first)
            val rev = new ArrayBuffer[Double](n * 2)
            var k = 0
            while (k < n) {
              val src = (n - k) % n
              rev += pts(src * 2); rev += pts(src * 2 + 1)
              k += 1
            }
            walked += rev
          } else walked += pts.take(n * 2)
        }
      }
    }
    g.geomType match {
      case GeomTypes.Polygon =>
        var r = 0
        while (r < g.o0.length - 1) { addRing(g.o0(r), g.o0(r + 1), r > 0); r += 1 }
      case GeomTypes.MultiPolygon =>
        var p = 0
        while (p < g.o0.length - 1) {
          var r = g.o0(p)
          while (r < g.o0(p + 1)) { addRing(g.o1(r), g.o1(r + 1), r > g.o0(p)); r += 1 }
          p += 1
        }
      case _ => throw new IllegalArgumentException(
        s"overlay operand must be POLYGON/MULTIPOLYGON, got ${GeomTypes.name(g.geomType)}")
    }
    assembleRings(walked, g.srid)
  }

  // =====================================================================
  // line × polygon clip (split at crossings, classify midpoints)
  // =====================================================================

  /** Clip a LINESTRING/MULTILINESTRING by a polygon: split every segment
    * at its crossings with the polygon boundary, keep the pieces whose
    * midpoints are inside (intersection) or outside (difference).
    * Boundary-riding pieces count as inside (closed-polygon semantics,
    * PostGIS-compatible). */
  private def lineClip(line: Geom, poly: Geom, keepInside: Boolean): Geom = {
    if (line.isEmpty || poly.isEmpty)
      return if (keepInside)
        Geom(GeomTypes.LineString, Dims.XY, Geom.emptyDoubles, Geom.emptyInts, Geom.emptyInts, null, line.srid)
      else line
    val s = line.stride
    val parts = new ArrayBuffer[ArrayBuffer[Double]]() // open polylines
    var current: ArrayBuffer[Double] = null

    // materialize the boundary once into flat arrays (no per-probe
    // iterator/tuple churn) with per-edge bboxes for cheap rejection —
    // the clip is otherwise O(segments × edges) in allocations
    val (eax, eay, ebx, eby) = {
      val ax = new ArrayBuffer[Double](); val ay = new ArrayBuffer[Double]()
      val bx = new ArrayBuffer[Double](); val by = new ArrayBuffer[Double]()
      def addRun(from: Int, until: Int): Unit = {
        var i = from
        while (i < until - 1) {
          ax += poly.coords(i * poly.stride); ay += poly.coords(i * poly.stride + 1)
          bx += poly.coords((i + 1) * poly.stride); by += poly.coords((i + 1) * poly.stride + 1)
          i += 1
        }
      }
      poly.geomType match {
        case GeomTypes.Polygon =>
          var r = 0
          while (r < poly.o0.length - 1) { addRun(poly.o0(r), poly.o0(r + 1)); r += 1 }
        case GeomTypes.MultiPolygon =>
          var r = 0
          while (r < poly.o1.length - 1) { addRun(poly.o1(r), poly.o1(r + 1)); r += 1 }
        case _ => ()
      }
      (ax.toArray, ay.toArray, bx.toArray, by.toArray)
    }
    val nEdges = eax.length

    def onBoundary(x: Double, y: Double): Boolean = {
      var e = 0
      while (e < nEdges) {
        val ax = eax(e); val ay = eay(e); val bx = ebx(e); val by = eby(e)
        if (x >= math.min(ax, bx) && x <= math.max(ax, bx) &&
          y >= math.min(ay, by) && y <= math.max(ay, by) &&
          signedArea(ax, ay, bx, by, x, y) == 0.0) return true
        e += 1
      }
      false
    }

    def keep(mx: Double, my: Double): Boolean = {
      val in = Pip.containsPoint(poly, mx, my) || onBoundary(mx, my)
      if (keepInside) in else !in
    }

    def clipSegment(x0: Double, y0: Double, x1: Double, y1: Double): Unit = {
      val ts = ArrayBuffer(0.0, 1.0)
      val sxmin = math.min(x0, x1); val sxmax = math.max(x0, x1)
      val symin = math.min(y0, y1); val symax = math.max(y0, y1)
      var e = 0
      while (e < nEdges) {
        val ax = eax(e); val ay = eay(e); val bx = ebx(e); val by = eby(e)
        // bbox reject before the exact intersection
        if (math.min(ax, bx) <= sxmax && math.max(ax, bx) >= sxmin &&
          math.min(ay, by) <= symax && math.max(ay, by) >= symin) {
          val r = segmentIntersection(x0, y0, x1, y1, ax, ay, bx, by)
          if (r != null) {
            def tOf(px: Double, py: Double): Double = {
              val dx = x1 - x0; val dy = y1 - y0
              if (math.abs(dx) >= math.abs(dy)) (px - x0) / dx else (py - y0) / dy
            }
            if (r.length == 2) ts += tOf(r(0), r(1))
            else { ts += tOf(r(0), r(1)); ts += tOf(r(2), r(3)) }
          }
        }
        e += 1
      }
      val sortedTs = ts.filter(t => t >= 0.0 && t <= 1.0).distinct.sorted
      var i = 0
      while (i < sortedTs.length - 1) {
        val ta = sortedTs(i); val tb = sortedTs(i + 1)
        val tm = (ta + tb) * 0.5
        val mx = x0 + (x1 - x0) * tm
        val my = y0 + (y1 - y0) * tm
        def at(t: Double): (Double, Double) =
          (if (t == 0.0) x0 else if (t == 1.0) x1 else x0 + (x1 - x0) * t,
            if (t == 0.0) y0 else if (t == 1.0) y1 else y0 + (y1 - y0) * t)
        if (keep(mx, my)) {
          val (ax, ay) = at(ta); val (bx, by) = at(tb)
          if (current == null) {
            current = ArrayBuffer(ax, ay, bx, by)
          } else if (current(current.length - 2) == ax && current.last == ay) {
            current += bx; current += by
          } else {
            parts += current
            current = ArrayBuffer(ax, ay, bx, by)
          }
        } else if (current != null) {
          parts += current; current = null
        }
        i += 1
      }
    }

    def walkPath(from: Int, until: Int): Unit = {
      var i = from
      while (i < until - 1) {
        clipSegment(line.coords(i * s), line.coords(i * s + 1),
          line.coords((i + 1) * s), line.coords((i + 1) * s + 1))
        i += 1
      }
      if (current != null) { parts += current; current = null }
    }

    line.geomType match {
      case GeomTypes.LineString => walkPath(0, line.numCoords)
      case GeomTypes.MultiLineString =>
        var r = 0
        while (r < line.o0.length - 1) { walkPath(line.o0(r), line.o0(r + 1)); r += 1 }
      case _ => ()
    }

    val nonEmpty = parts.filter(_.length >= 4)
    if (nonEmpty.isEmpty)
      Geom(GeomTypes.LineString, Dims.XY, Geom.emptyDoubles, Geom.emptyInts, Geom.emptyInts, null, line.srid)
    else if (nonEmpty.length == 1)
      Geom(GeomTypes.LineString, Dims.XY, nonEmpty(0).toArray, Geom.emptyInts, Geom.emptyInts, null, line.srid)
    else {
      val coords = new ArrayBuffer[Double]()
      val o0 = new ArrayBuffer[Int](); o0 += 0
      nonEmpty.foreach { p => coords ++= p; o0 += o0.last + p.length / 2 }
      Geom(GeomTypes.MultiLineString, Dims.XY, coords.toArray, o0.toArray,
        Geom.emptyInts, null, line.srid)
    }
  }

  /** Point/multipoint × polygon clip (closed-polygon semantics: boundary
    * points are inside). */
  private def pointClip(pts: Geom, poly: Geom, keepInside: Boolean): Geom = {
    val s = pts.stride
    val kept = new ArrayBuffer[Double]()
    def onBoundaryP(x: Double, y: Double): Boolean = {
      def edges(from: Int, until: Int): Boolean = {
        var i = from
        var found = false
        while (i < until - 1 && !found) {
          val ax = poly.coords(i * poly.stride); val ay = poly.coords(i * poly.stride + 1)
          val bx = poly.coords((i + 1) * poly.stride); val by = poly.coords((i + 1) * poly.stride + 1)
          found = signedArea(ax, ay, bx, by, x, y) == 0.0 &&
            x >= math.min(ax, bx) && x <= math.max(ax, bx) &&
            y >= math.min(ay, by) && y <= math.max(ay, by)
          i += 1
        }
        found
      }
      poly.geomType match {
        case GeomTypes.Polygon =>
          (0 until poly.o0.length - 1).exists(r => edges(poly.o0(r), poly.o0(r + 1)))
        case GeomTypes.MultiPolygon =>
          (0 until poly.o1.length - 1).exists(r => edges(poly.o1(r), poly.o1(r + 1)))
        case _ => false
      }
    }
    var i = 0
    val n = pts.numCoords
    while (i < n) {
      val x = pts.coords(i * s); val y = pts.coords(i * s + 1)
      val in = Pip.containsPoint(poly, x, y) || onBoundaryP(x, y)
      if (in == keepInside) { kept += x; kept += y }
      i += 1
    }
    if (kept.isEmpty)
      Geom(GeomTypes.Point, Dims.XY, Geom.emptyDoubles, Geom.emptyInts, Geom.emptyInts, null, pts.srid)
    else if (kept.length == 2)
      Geom(GeomTypes.Point, Dims.XY, kept.toArray, Geom.emptyInts, Geom.emptyInts, null, pts.srid)
    else
      Geom(GeomTypes.MultiPoint, Dims.XY, kept.toArray, Geom.emptyInts, Geom.emptyInts, null, pts.srid)
  }
}
