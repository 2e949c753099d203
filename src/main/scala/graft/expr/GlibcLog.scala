package graft.expr

/** Bit-exact natural log matching glibc's `log` (hence DuckDB's `ln`).
  *
  * Neither of the JVM's logs reproduces glibc exactly: HotSpot's
  * `Math.log` intrinsic is CORRECTLY ROUNDED on inputs where glibc's
  * isn't (glibc guarantees <0.52 ulp, so it misrounds ~3e-5 of
  * arguments — e.g. ln(1.2572145545796737) at the BM25 idf for
  * df=398, N=500), and `StrictMath.log` (fdlibm) differs elsewhere.
  * Cross-engine hash parity therefore needs glibc's EXACT result,
  * misroundings included.
  *
  * This is a faithful port of the table-driven log in ARM
  * optimized-routines (`math/log.c`, MIT-licensed; adopted by glibc
  * 2.28+) in its FMA build — the variant glibc's ifunc selects on
  * any AVX2 machine. The operation sequence (which products are
  * fused, in what order) was taken from the disassembly of
  * `__log_fma` in this container's libm.so.6, and the coefficient /
  * lookup tables were extracted from the same binary's `__log_data`
  * (ln2hi/lo, 5-term poly, 11-term near-1 poly, 128-entry 1/c and
  * log(c) tables). `Math.fma` is an exact fused op by JVM spec, so
  * every step reproduces the native code bit-for-bit on any
  * hardware. Validated against DuckDB `ln` on 16M inputs spanning
  * integers, half-integers, 1e-20..1e20 randoms, a dense near-1.0
  * band, BM25/TF-IDF idf ratios, and subnormals: 0 mismatches
  * (HotSpot Math.log differs from glibc on 113 of them).
  *
  * Same special cases as glibc: log(1)=+0, log(0)=-Inf, log(<0)=NaN,
  * log(+Inf)=+Inf, NaN propagates; subnormals are exact.
  */
object GlibcLog {
  private final val Ln2hi = java.lang.Double.longBitsToDouble(4604418534313441280L)
  private final val Ln2lo = java.lang.Double.longBitsToDouble(4408728642709317424L)
  private final val A0 = java.lang.Double.longBitsToDouble(-4620693217682128895L)
  private final val A1 = java.lang.Double.longBitsToDouble(4599676419420794971L)
  private final val A2 = java.lang.Double.longBitsToDouble(-4625196817310857840L)
  private final val A3 = java.lang.Double.longBitsToDouble(4596373889406271761L)
  private final val A4 = java.lang.Double.longBitsToDouble(-4628199077211354977L)
  private final val B0 = java.lang.Double.longBitsToDouble(-4620693217682128896L)
  private final val B1 = java.lang.Double.longBitsToDouble(4599676419421066615L)
  private final val B2 = java.lang.Double.longBitsToDouble(-4625196817309499957L)
  private final val B3 = java.lang.Double.longBitsToDouble(4596373779694083340L)
  private final val B4 = java.lang.Double.longBitsToDouble(-4628199217059904089L)
  private final val B5 = java.lang.Double.longBitsToDouble(4594314991578177072L)
  private final val B6 = java.lang.Double.longBitsToDouble(-4629700418476032667L)
  private final val B7 = java.lang.Double.longBitsToDouble(4592670532434581194L)
  private final val B8 = java.lang.Double.longBitsToDouble(-4631501506041845505L)
  private final val B9 = java.lang.Double.longBitsToDouble(4591280744628736133L)
  private final val B10 = java.lang.Double.longBitsToDouble(-4632706398146181683L)
  private final val Invc: Array[Double] = Array(
    java.lang.Double.longBitsToDouble(4609210952320081567L), java.lang.Double.longBitsToDouble(4609174151535323423L), java.lang.Double.longBitsToDouble(4609137762941711776L), java.lang.Double.longBitsToDouble(4609101780076432509L), java.lang.Double.longBitsToDouble(4609066195948516561L), java.lang.Double.longBitsToDouble(4609031003647708346L), java.lang.Double.longBitsToDouble(4608996196778918435L), java.lang.Double.longBitsToDouble(4608961770493910745L), java.lang.Double.longBitsToDouble(4608927715981993156L), java.lang.Double.longBitsToDouble(4608894029497490452L), java.lang.Double.longBitsToDouble(4608860704429464652L), java.lang.Double.longBitsToDouble(4608827733622991951L), java.lang.Double.longBitsToDouble(4608795113711964382L), java.lang.Double.longBitsToDouble(4608762837695273592L), java.lang.Double.longBitsToDouble(4608730900845713031L), java.lang.Double.longBitsToDouble(4608699297346055123L), java.lang.Double.longBitsToDouble(4608668021725560723L), java.lang.Double.longBitsToDouble(4608637069496305027L), java.lang.Double.longBitsToDouble(4608606436072799711L), java.lang.Double.longBitsToDouble(4608576115407380183L), java.lang.Double.longBitsToDouble(4608546104468711488L), java.lang.Double.longBitsToDouble(4608516395921613768L), java.lang.Double.longBitsToDouble(4608486988337653130L), java.lang.Double.longBitsToDouble(4608457874380981300L), java.lang.Double.longBitsToDouble(4608429050692185355L), java.lang.Double.longBitsToDouble(4608400513723603028L), java.lang.Double.longBitsToDouble(4608372259037676634L), java.lang.Double.longBitsToDouble(4608344281559988475L), java.lang.Double.longBitsToDouble(4608316577295561905L), java.lang.Double.longBitsToDouble(4608289143243931279L), java.lang.Double.longBitsToDouble(4608261974399864041L), java.lang.Double.longBitsToDouble(4608235066966982955L), java.lang.Double.longBitsToDouble(4608208418496699064L), java.lang.Double.longBitsToDouble(4608182024348356610L), java.lang.Double.longBitsToDouble(4608155880746416668L), java.lang.Double.longBitsToDouble(4608129984310884066L), java.lang.Double.longBitsToDouble(4608104331790373952L), java.lang.Double.longBitsToDouble(4608078919386516260L), java.lang.Double.longBitsToDouble(4608053745083813193L), java.lang.Double.longBitsToDouble(4608028803162061200L), java.lang.Double.longBitsToDouble(4608004092140582977L), java.lang.Double.longBitsToDouble(4607979607715064273L), java.lang.Double.longBitsToDouble(4607955348240203050L), java.lang.Double.longBitsToDouble(4607931308525231019L), java.lang.Double.longBitsToDouble(4607907488200963376L), java.lang.Double.longBitsToDouble(4607883882914095605L), java.lang.Double.longBitsToDouble(4607860489364257727L), java.lang.Double.longBitsToDouble(4607837304735659453L), java.lang.Double.longBitsToDouble(4607814327318677563L), java.lang.Double.longBitsToDouble(4607791553269285046L), java.lang.Double.longBitsToDouble(4607768980718633266L), java.lang.Double.longBitsToDouble(4607746606204386459L), java.lang.Double.longBitsToDouble(4607724427722704907L), java.lang.Double.longBitsToDouble(4607702441940444521L), java.lang.Double.longBitsToDouble(4607680648182201980L), java.lang.Double.longBitsToDouble(4607659041870259945L), java.lang.Double.longBitsToDouble(4607637621113100982L), java.lang.Double.longBitsToDouble(4607616384371159229L), java.lang.Double.longBitsToDouble(4607595329002388662L), java.lang.Double.longBitsToDouble(4607574451424080346L), java.lang.Double.longBitsToDouble(4607553751206027229L), java.lang.Double.longBitsToDouble(4607533225893614156L), java.lang.Double.longBitsToDouble(4607512871202519514L), java.lang.Double.longBitsToDouble(4607492687924081969L), java.lang.Double.longBitsToDouble(4607472672061011119L), java.lang.Double.longBitsToDouble(4607452821607836595L), java.lang.Double.longBitsToDouble(4607433134784028622L), java.lang.Double.longBitsToDouble(4607413609963496737L), java.lang.Double.longBitsToDouble(4607394244387313690L), java.lang.Double.longBitsToDouble(4607375037409146577L), java.lang.Double.longBitsToDouble(4607355985284043577L), java.lang.Double.longBitsToDouble(4607337087808759775L), java.lang.Double.longBitsToDouble(4607318342423685371L), java.lang.Double.longBitsToDouble(4607299746773962521L), java.lang.Double.longBitsToDouble(4607281300320876844L), java.lang.Double.longBitsToDouble(4607263000134495376L), java.lang.Double.longBitsToDouble(4607244845192359337L), java.lang.Double.longBitsToDouble(4607226833383535273L), java.lang.Double.longBitsToDouble(4607208962367583048L), java.lang.Double.longBitsToDouble(4607191232174928277L), java.lang.Double.longBitsToDouble(4607147371718441498L), java.lang.Double.longBitsToDouble(4607078088715659892L), java.lang.Double.longBitsToDouble(4607009867155216686L), java.lang.Double.longBitsToDouble(4606942683337764301L), java.lang.Double.longBitsToDouble(4606876514109166567L), java.lang.Double.longBitsToDouble(4606811335652258219L), java.lang.Double.longBitsToDouble(4606747126592769179L), java.lang.Double.longBitsToDouble(4606683865489775029L), java.lang.Double.longBitsToDouble(4606621530588224086L), java.lang.Double.longBitsToDouble(4606560103363492760L), java.lang.Double.longBitsToDouble(4606499562142339331L), java.lang.Double.longBitsToDouble(4606439889401765070L), java.lang.Double.longBitsToDouble(4606381066660273821L), java.lang.Double.longBitsToDouble(4606323074200710349L), java.lang.Double.longBitsToDouble(4606265896982771970L), java.lang.Double.longBitsToDouble(4606209516050516077L), java.lang.Double.longBitsToDouble(4606153914748590084L), java.lang.Double.longBitsToDouble(4606099078592044940L), java.lang.Double.longBitsToDouble(4606044990914488127L), java.lang.Double.longBitsToDouble(4605991636799559361L), java.lang.Double.longBitsToDouble(4605939000208149032L), java.lang.Double.longBitsToDouble(4605887068574268972L), java.lang.Double.longBitsToDouble(4605835828034898059L), java.lang.Double.longBitsToDouble(4605785262199222346L), java.lang.Double.longBitsToDouble(4605735360665939838L), java.lang.Double.longBitsToDouble(4605686108857056674L), java.lang.Double.longBitsToDouble(4605637494364657831L), java.lang.Double.longBitsToDouble(4605589505339650955L), java.lang.Double.longBitsToDouble(4605542130267147047L), java.lang.Double.longBitsToDouble(4605495355974611665L), java.lang.Double.longBitsToDouble(4605449172481162267L), java.lang.Double.longBitsToDouble(4605403567997038992L), java.lang.Double.longBitsToDouble(4605358530648067631L), java.lang.Double.longBitsToDouble(4605314051900459893L), java.lang.Double.longBitsToDouble(4605270121620391992L), java.lang.Double.longBitsToDouble(4605226727711920870L), java.lang.Double.longBitsToDouble(4605183861247170461L), java.lang.Double.longBitsToDouble(4605141513151447164L), java.lang.Double.longBitsToDouble(4605099672569037582L), java.lang.Double.longBitsToDouble(4605058332693305339L), java.lang.Double.longBitsToDouble(4605017483302377992L), java.lang.Double.longBitsToDouble(4604977115906260565L), java.lang.Double.longBitsToDouble(4604937222866862688L), java.lang.Double.longBitsToDouble(4604897794226955049L), java.lang.Double.longBitsToDouble(4604858822028998061L), java.lang.Double.longBitsToDouble(4604820300194325954L), java.lang.Double.longBitsToDouble(4604782219042948695L), java.lang.Double.longBitsToDouble(4604744573281243916L))
  private final val Logc: Array[Double] = Array(
    java.lang.Double.longBitsToDouble(-4623001644594458624L), java.lang.Double.longBitsToDouble(-4623103421223993344L), java.lang.Double.longBitsToDouble(-4623204626469888000L), java.lang.Double.longBitsToDouble(-4623305265525524480L), java.lang.Double.longBitsToDouble(-4623405345371293696L), java.lang.Double.longBitsToDouble(-4623504873091497984L), java.lang.Double.longBitsToDouble(-4623603854631464960L), java.lang.Double.longBitsToDouble(-4623702291801485312L), java.lang.Double.longBitsToDouble(-4623800198040436736L), java.lang.Double.longBitsToDouble(-4623897572561891328L), java.lang.Double.longBitsToDouble(-4623994423069792256L), java.lang.Double.longBitsToDouble(-4624090759183681536L), java.lang.Double.longBitsToDouble(-4624186579721687040L), java.lang.Double.longBitsToDouble(-4624281894387867648L), java.lang.Double.longBitsToDouble(-4624376706469822464L), java.lang.Double.longBitsToDouble(-4624471022728323072L), java.lang.Double.longBitsToDouble(-4624564849163466752L), java.lang.Double.longBitsToDouble(-4624658189065416704L), java.lang.Double.longBitsToDouble(-4624751046222612480L), java.lang.Double.longBitsToDouble(-4624843429099472896L), java.lang.Double.longBitsToDouble(-4624935337201788928L), java.lang.Double.longBitsToDouble(-4625026783432208384L), java.lang.Double.longBitsToDouble(-4625117762759182336L), java.lang.Double.longBitsToDouble(-4625219759858323456L), java.lang.Double.longBitsToDouble(-4625399907168571392L), java.lang.Double.longBitsToDouble(-4625579154273718272L), java.lang.Double.longBitsToDouble(-4625757511248924672L), java.lang.Double.longBitsToDouble(-4625934992642936832L), java.lang.Double.longBitsToDouble(-4626111606611931136L), java.lang.Double.longBitsToDouble(-4626287355298770944L), java.lang.Double.longBitsToDouble(-4626462254034776064L), java.lang.Double.longBitsToDouble(-4626636310817026048L), java.lang.Double.longBitsToDouble(-4626809525216571392L), java.lang.Double.longBitsToDouble(-4626981911345106944L), java.lang.Double.longBitsToDouble(-4627153478089166848L), java.lang.Double.longBitsToDouble(-4627324232080703488L), java.lang.Double.longBitsToDouble(-4627494179410006016L), java.lang.Double.longBitsToDouble(-4627663330115162112L), java.lang.Double.longBitsToDouble(-4627831682652217344L), java.lang.Double.longBitsToDouble(-4627999260573982720L), java.lang.Double.longBitsToDouble(-4628166059363127296L), java.lang.Double.longBitsToDouble(-4628332093779070976L), java.lang.Double.longBitsToDouble(-4628497360864804864L), java.lang.Double.longBitsToDouble(-4628661882092060672L), java.lang.Double.longBitsToDouble(-4628825646262845440L), java.lang.Double.longBitsToDouble(-4628988669709762560L), java.lang.Double.longBitsToDouble(-4629150961896939520L), java.lang.Double.longBitsToDouble(-4629312529226752000L), java.lang.Double.longBitsToDouble(-4629473370604888064L), java.lang.Double.longBitsToDouble(-4629633500104974336L), java.lang.Double.longBitsToDouble(-4629885419494080512L), java.lang.Double.longBitsToDouble(-4630202856870232064L), java.lang.Double.longBitsToDouble(-4630518899208011776L), java.lang.Double.longBitsToDouble(-4630833569720655872L), java.lang.Double.longBitsToDouble(-4631146854008004608L), java.lang.Double.longBitsToDouble(-4631458794144497664L), java.lang.Double.longBitsToDouble(-4631769394161991680L), java.lang.Double.longBitsToDouble(-4632078653278388224L), java.lang.Double.longBitsToDouble(-4632386587106738176L), java.lang.Double.longBitsToDouble(-4632693225620537344L), java.lang.Double.longBitsToDouble(-4632998552948056064L), java.lang.Double.longBitsToDouble(-4633302583234355200L), java.lang.Double.longBitsToDouble(-4633605358374002688L), java.lang.Double.longBitsToDouble(-4633906845220462592L), java.lang.Double.longBitsToDouble(-4634210147985391616L), java.lang.Double.longBitsToDouble(-4634808141119799296L), java.lang.Double.longBitsToDouble(-4635403665815568384L), java.lang.Double.longBitsToDouble(-4635996730543652864L), java.lang.Double.longBitsToDouble(-4636587378960318464L), java.lang.Double.longBitsToDouble(-4637175591025082368L), java.lang.Double.longBitsToDouble(-4637761442254848000L), java.lang.Double.longBitsToDouble(-4638344900229382144L), java.lang.Double.longBitsToDouble(-4639144394989273088L), java.lang.Double.longBitsToDouble(-4640301971095257088L), java.lang.Double.longBitsToDouble(-4641454871361257472L), java.lang.Double.longBitsToDouble(-4642603205003706368L), java.lang.Double.longBitsToDouble(-4644282710821896192L), java.lang.Double.longBitsToDouble(-4646561198544125952L), java.lang.Double.longBitsToDouble(-4649946807895588864L), java.lang.Double.longBitsToDouble(-4656717575967473664L), java.lang.Double.longBitsToDouble(4571135975984463872L), java.lang.Double.longBitsToDouble(4577869718869573632L), java.lang.Double.longBitsToDouble(4581232448741998592L), java.lang.Double.longBitsToDouble(4583432697401638912L), java.lang.Double.longBitsToDouble(4585140340856520704L), java.lang.Double.longBitsToDouble(4586223922483150848L), java.lang.Double.longBitsToDouble(4587299414251962368L), java.lang.Double.longBitsToDouble(4588366935595909120L), java.lang.Double.longBitsToDouble(4589297319838007296L), java.lang.Double.longBitsToDouble(4589823285785337856L), java.lang.Double.longBitsToDouble(4590345449255731200L), java.lang.Double.longBitsToDouble(4590863851743330304L), java.lang.Double.longBitsToDouble(4591378546364645376L), java.lang.Double.longBitsToDouble(4591889600642572288L), java.lang.Double.longBitsToDouble(4592397044266393600L), java.lang.Double.longBitsToDouble(4592900944725221376L), java.lang.Double.longBitsToDouble(4593401352421269504L), java.lang.Double.longBitsToDouble(4593784960540819456L), java.lang.Double.longBitsToDouble(4594031733641490432L), java.lang.Double.longBitsToDouble(4594276827212165120L), java.lang.Double.longBitsToDouble(4594520269598838784L), java.lang.Double.longBitsToDouble(4594762074469634048L), java.lang.Double.longBitsToDouble(4595002262718939136L), java.lang.Double.longBitsToDouble(4595240868508725248L), java.lang.Double.longBitsToDouble(4595477899084623872L), java.lang.Double.longBitsToDouble(4595713382617092096L), java.lang.Double.longBitsToDouble(4595947338221678592L), java.lang.Double.longBitsToDouble(4596179783459962880L), java.lang.Double.longBitsToDouble(4596410735360753664L), java.lang.Double.longBitsToDouble(4596640220181168128L), java.lang.Double.longBitsToDouble(4596868249655824384L), java.lang.Double.longBitsToDouble(4597094845431726080L), java.lang.Double.longBitsToDouble(4597320030710423552L), java.lang.Double.longBitsToDouble(4597543812985176064L), java.lang.Double.longBitsToDouble(4597766208615342080L), java.lang.Double.longBitsToDouble(4597987244934402048L), java.lang.Double.longBitsToDouble(4598191076868601856L), java.lang.Double.longBitsToDouble(4598300254877765632L), java.lang.Double.longBitsToDouble(4598408778231476224L), java.lang.Double.longBitsToDouble(4598516648831078400L), java.lang.Double.longBitsToDouble(4598623877854349312L), java.lang.Double.longBitsToDouble(4598730472393834496L), java.lang.Double.longBitsToDouble(4598836437669079040L), java.lang.Double.longBitsToDouble(4598941785460615168L), java.lang.Double.longBitsToDouble(4599046522653597696L), java.lang.Double.longBitsToDouble(4599150651412060160L), java.lang.Double.longBitsToDouble(4599254183977103360L), java.lang.Double.longBitsToDouble(4599357121047289856L))

  private final val P27 = 134217728.0d // 0x1p27
  private final val N27 = -134217728.0d

  // scalastyle:off return
  def log(x: Double): Double = {
    var ix = java.lang.Double.doubleToRawLongBits(x)
    val top = (ix >>> 48).toInt
    val lo1 = 0x3fee000000000000L // bits(1.0 - 0x1p-4)
    val width = 0x0003090000000000L // bits(1.0 + 0x1.09p-4) - lo1
    if (java.lang.Long.compareUnsigned(ix - lo1, width) < 0) {
      // near-1.0 path: r = x-1 split Dekker-style so r - r^2/2 is exact
      if (ix == 0x3ff0000000000000L) return 0.0
      val r = x - 1.0
      val r2 = r * r
      val r3 = r * r2
      val u1 = Math.fma(r, B2, B1)
      val u2 = Math.fma(r, B5, B4)
      val u3 = Math.fma(r, B8, B7)
      val v1 = Math.fma(r2, B3, u1)
      val v2 = Math.fma(r2, B6, u2)
      val v3 = Math.fma(r2, B9, u3)
      val v3b = Math.fma(r3, B10, v3)
      val v4 = Math.fma(v3b, r3, v2)
      val poly = Math.fma(v4, r3, v1)
      val t = Math.fma(r, P27, r)
      val rhi = Math.fma(N27, r, t)
      val rlo = r - rhi
      val rhi2 = rhi * rhi
      val hi = Math.fma(rhi2, B0, r)
      val lo = Math.fma(B0 * rlo, r + rhi, Math.fma(rhi2, B0, r - hi))
      return Math.fma(poly, r3, lo) + hi
    }
    if (java.lang.Integer.compareUnsigned(top - 0x10, 0x7ff0 - 0x10) >= 0) {
      if (ix << 1 == 0) return Double.NegativeInfinity
      if (ix == 0x7ff0000000000000L) return x
      if ((top & 0x8000) != 0 || (top & 0x7ff0) == 0x7ff0) return Double.NaN
      // subnormal: scale into the normal range, fold 2^52 into k
      ix = java.lang.Double.doubleToRawLongBits(x * 4.503599627370496e15) - (52L << 52)
    }
    // x = 2^k z, z in [0x1.6p-1, 0x1.6p0): table index from the top
    // 7 mantissa bits; k and z derived purely from the bit pattern
    val tmp = ix - 0x3fe6000000000000L
    val i = ((tmp >>> 45) & 127).toInt
    val k = (tmp >> 52).toInt
    val iz = ix - (tmp & 0xfff0000000000000L)
    val invc = Invc(i)
    val logc = Logc(i)
    val z = java.lang.Double.longBitsToDouble(iz)
    // log(x) = k ln2 + log(c) + log1p(r), r = z/c - 1 via one fma
    val r = Math.fma(z, invc, -1.0)
    val kd = k.toDouble
    val w = Math.fma(kd, Ln2hi, logc)
    val hi = w + r
    val r2 = r * r
    val lo = Math.fma(kd, Ln2lo, (w - hi) + r)
    val r3 = r * r2
    val t1 = Math.fma(r, A2, A1)
    val t2 = Math.fma(r, A4, A3)
    val s = Math.fma(r2, A0, lo)
    val p = Math.fma(r2, t2, t1)
    Math.fma(r3, p, s) + hi
  }
  // scalastyle:on return
}
