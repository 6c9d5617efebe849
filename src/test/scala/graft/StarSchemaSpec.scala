package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.star.StarSchemaJob

/** End-to-end star-schema test on a synthesized ANEEL-shaped CSV fixture
  * (FIXTURES.md §A): exercises first-wins dedup, survivor determinism,
  * empty IdcGeracaoQualificada, empty/malformed/short dates, BR numbers
  * with thousands dots, multi-quarter calendar span, sentinel semantics.
  */
class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val header =
    "SigTipoGeracao;DscOrigemCombustivel;DscFonteCombustivel;DscFaseUsina;" +
    "DscTipoOutorga;IdcGeracaoQualificada;SigUFPrincipal;DscMuninicpios;CodCEG;" +
    "NomEmpreendimento;DscPropriRegimePariticipacao;DatEntradaOperacao;" +
    "MdaPotenciaOutorgadaKw;MdaPotenciaFiscalizadaKw;MdaGarantiaFisicaKw"

  private val rows = Seq(
    // dup dim keys; CodCEG repeated with DIFFERENT NomEmpreendimento
    "UHE;Hídrica;Potencial hidráulico;Operação;Concessão;S;MG;Três Marias;CEG001;Usina Alpha;Privado;2019-03-15T00:00:00;1.234,56;1.200,00;800,25",
    "UHE;Hídrica;Potencial hidráulico;Operação;Concessão;S;MG;Três Marias;CEG001;Usina Zeta;Privado;2019-06-20T00:00:00;500,00;450,10;300,00",
    // empty IdcGeracaoQualificada -> N/A; malformed date; garbage number
    "EOL;Eólica;Cinética do vento;Construção;Autorização;;BA;Caetité;CEG002;Parque Beta;Público;bad-date;abc;;2.000,00",
    // short date -> null; spans another quarter/year
    "UTE;Fóssil;Gás natural;Operação;Registro;N;SP;Cubatão;CEG003;Term Gama;Privado;2020;10,5;0,0;0,0",
    "UTE;Fóssil;Gás natural;Operação;Registro;N;SP;Cubatão;CEG004;Term Delta;Privado;2020-01-02T12:00:00;99,99;88,88;77,77")

  private lazy val outDir = Files.createTempDirectory("graft-star").toString
  private lazy val star = {
    val in = Files.createTempDirectory("graft-aneel").resolve("in.csv")
    Files.write(in, (header +: rows).mkString("\n").getBytes(Charset.forName("ISO-8859-1")))
    StarSchemaJob.run(spark, in.toString, outDir)
  }

  test("dims dedupe to expected cardinalities with dense SKs") {
    assert(star.dimGeracao.count() == 3)
    assert(star.dimStatus.count() == 3)
    assert(star.dimLocalizacao.count() == 3)
    val sks = star.dimGeracao.select("ID_Geracao").as[Long].collect().sorted
    assert(sks.toSeq == Seq(1L, 2L, 3L))
  }

  test("empty IdcGeracaoQualificada becomes N/A in dim_status") {
    val vals = star.dimStatus.select("IdcGeracaoQualificada").as[String].collect().toSet
    assert(vals == Set("S", "N", "N/A"))
  }

  test("first-wins survivor for dim_empreendimento is deterministic") {
    assert(star.dimEmpreendimento.count() == 4)
    val ceg1 = star.dimEmpreendimento.filter($"CodCEG" === "CEG001")
      .select("NomEmpreendimento").as[String].head()
    assert(ceg1 == "Usina Alpha") // first by stable attr order
  }

  test("calendar spans [min,max] operation dates inclusive with pt-BR names") {
    // valid dates: 2019-03-15 .. 2019-06-20 and 2020-01-02 -> range is min..max
    val n = star.dimTempo.count()
    val expected = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse("2019-03-15"),
      java.time.LocalDate.parse("2020-01-02")) + 1
    assert(n == expected)
    val first = star.dimTempo.orderBy("ChaveData").limit(1)
      .select($"ChaveData", $"NomeMes", $"DiaDaSemana", $"Trimestre")
      .as[(Int, String, String, String)].head()
    assert(first == ((20190315, "março", "sexta-feira", "T1")))
  }

  test("fact preserves grain, sentinels, BR-parsed measures") {
    val f = star.fato.cache()
    assert(f.count() == rows.size) // grain = 1 row per input row
    // no FK misses possible (dims from same file): all FKs > 0
    assert(f.filter($"ID_Geracao" === -1 || $"ID_Status" === -1 || $"ID_Localizacao" === -1).count() == 0)
    val bad = f.filter($"CodCEG" === "CEG002")
      .select($"FK_DataOperacao", $"MdaPotenciaOutorgadaKw", $"MdaPotenciaFiscalizadaKw", $"MdaGarantiaFisicaKw")
      .as[(Int, Double, Double, Double)].head()
    assert(bad == ((0, 0.0, 0.0, 2000.0))) // date 0 sentinel; garbage/empty -> 0.0
    val alpha = f.filter($"CodCEG" === "CEG001" && $"FK_DataOperacao" === 20190315)
    assert(alpha.select($"MdaPotenciaOutorgadaKw").as[Double].head() == 1234.56)
  }

  test("fact-dim referential integrity") {
    val orphans = star.fato.join(star.dimGeracao, Seq("ID_Geracao"), "left_anti").count()
    assert(orphans == 0)
  }

  test("CSV outputs written with decimal-comma measures") {
    val fatoCsv = spark.read.option("sep", ";").option("header", "true")
      .option("encoding", "ISO-8859-1").csv(s"$outDir/fato_geracao")
    val m = fatoCsv.filter($"CodCEG" === "CEG001" && $"MdaPotenciaOutorgadaKw" === "1234,56").count()
    assert(m == 1)
  }
}
