package graft.catalog

import com.fasterxml.jackson.databind.JsonNode
import graft.datatypes.DataRef
import org.apache.hadoop.conf.Configuration
import scala.jdk.CollectionConverters._

/** NASA Earthdata CMR collection search → catalog (reference
  * intake/readers/catalogs.py:691 EarthdataCatalogReader): the reference
  * calls `earthaccess.search_datasets(temporal=..., cloud_hosted=True)`
  * and emits one entry per collection keyed by its concept-id, each
  * rehydrating to an EarthdataReader that opens the granule files as
  * netCDF. Here the walk speaks CMR's JSON search API directly: the
  * collections document is `{"feed": {"entry": [...]}}` and each entry's
  * DataRef points at the granule search for its concept-id, which the
  * `earthdata_granules` reader resolves to data links and reads through
  * the native NetCDF3 reader.
  */
object EarthdataCatalog {

  import RegistryJson._

  val DefaultSearch = "https://cmr.earthdata.nasa.gov/search"

  /** CMR collections query url for a temporal range (the reference's
    * default temporal span, catalogs.py:729).
    */
  def searchUrl(base: String = DefaultSearch, temporal: (String, String) = ("1980-01-01", "2023-11-10")): String =
    s"${base.stripSuffix("/")}/collections.json?temporal=${temporal._1},${temporal._2}&cloud_hosted=true"

  /** Walk a collections listing document. `granulesBase` is where each
    * entry's granule search lives — defaults to the CMR search root, and
    * tests point it at fixture files.
    */
  def fromUrl(
      listingUrl: String,
      conf: Configuration = graft.core.SerializableHadoopConf.sessionConf(),
      granulesBase: String = DefaultSearch
  ): Catalog = {
    val doc = read(listingUrl, conf)
    val entries = Option(doc.get("feed")).flatMap(f => Option(f.get("entry"))).toSeq
      .flatMap(_.elements().asScala.toSeq)
    entries.foldLeft(Catalog(metadata = Map("earthdata_search" -> listingUrl))) { (cat, e) =>
      textOpt(e, "id").fold(cat) { concept =>
        val meta = scalarMeta(e) + ("concept_id" -> concept)
        cat.add(
          concept,
          DataRef("earthdata", s"${granulesBase.stripSuffix("/")}/granules.json?concept_id=$concept",
            metadata = meta),
          "earthdata_granules"
        )
      }
    }
  }
}

/** Static example-dataset registries. The reference builds these three
  * catalogs by introspecting locally installed python packages —
  * `dir(sklearn.datasets)` (catalogs.py:536), `torch{vision,audio,text}
  * .datasets.__all__` (catalogs.py:581) and the tensorflow-datasets
  * community registry (catalogs.py:635). There is no package to
  * introspect on a JVM, so the walker degenerates to the registry
  * snapshot itself: the curated stable names each package documents,
  * emitted as declared (backend-gated) entries exactly like the Delta /
  * Kafka readers — listable, searchable and parameterised, readable only
  * where a bridge to the owning runtime exists.
  */
object ExampleCatalogs {

  /** sklearn.datasets loaders: the `load_*` (bundled) and `fetch_*`
    * (downloaded) names of the sklearn 1.x stable API, as the reference
    * discovers via `dir(sklearn.datasets)` (catalogs.py:553-559).
    */
  val sklearnLoad: Seq[String] = Seq(
    "breast_cancer", "diabetes", "digits", "iris", "linnerud", "sample_image", "sample_images",
    "svmlight_file", "svmlight_files", "wine")
  val sklearnFetch: Seq[String] = Seq(
    "20newsgroups", "20newsgroups_vectorized", "california_housing", "covtype", "kddcup99",
    "lfw_pairs", "lfw_people", "olivetti_faces", "openml", "rcv1", "species_distributions")

  def sklearnExamples(): Catalog =
    (sklearnLoad.map(_ -> "load") ++ sklearnFetch.map(_ -> "fetch"))
      .foldLeft(Catalog(metadata = Map("registry" -> "sklearn.datasets"))) { case (cat, (name, how)) =>
        cat.add(name,
          DataRef("sklearn_example", s"sklearn:datasets/${how}_$name",
            metadata = Map("loader" -> s"${how}_$name", "fetched" -> (how == "fetch").toString)),
          "sklearn_example")
      }

  /** Torch dataset registry (catalogs.py:581 TorchDatasetsCatalog):
    * sections mirror the three `torch{name}.datasets` packages; every
    * entry takes the reference's `rootdir` cache-directory kwarg.
    */
  val torchSections: Map[String, Seq[String]] = Map(
    "vision" -> Seq("CIFAR10", "CIFAR100", "Caltech101", "CelebA", "CocoDetection", "EMNIST",
      "FashionMNIST", "ImageNet", "KMNIST", "LSUN", "MNIST", "Places365", "QMNIST", "STL10",
      "SVHN", "VOCDetection", "VOCSegmentation"),
    "audio" -> Seq("CMUARCTIC", "COMMONVOICE", "GTZAN", "LIBRISPEECH", "LIBRITTS", "LJSPEECH",
      "SPEECHCOMMANDS", "TEDLIUM", "VCTK_092", "YESNO"),
    "text" -> Seq("AG_NEWS", "AmazonReviewFull", "AmazonReviewPolarity", "CoLA", "DBpedia",
      "IMDB", "MNLI", "MRPC", "PennTreebank", "QNLI", "QQP", "RTE", "SQuAD1", "SQuAD2",
      "SST2", "STSB", "WNLI", "WikiText103", "WikiText2", "YelpReviewFull")
  )

  def torchDatasets(rootdir: String): Catalog =
    torchSections.toSeq.sortBy(_._1).foldLeft(Catalog(metadata = Map("registry" -> "torch"))) {
      case (cat, (section, names)) =>
        names.foldLeft(cat) { (c, name) =>
          c.add(name,
            DataRef("torch_dataset", s"torch:$section/$name",
              options = Map("rootdir" -> rootdir),
              metadata = Map("section" -> section)),
            "torch_dataset")
        }
    }

  /** TensorFlow public dataset registry (catalogs.py:635
    * TensorFlowDatasetsCatalog): the well-known names of the tfds
    * community registry the reference enumerates.
    */
  val tfdsNames: Seq[String] = Seq(
    "ag_news_subset", "c4", "cifar10", "cifar100", "civil_comments", "fashion_mnist", "glue",
    "imagenet2012", "imdb_reviews", "lm1b", "mnist", "natural_questions", "oxford_flowers102",
    "oxford_iiit_pet", "squad", "super_glue", "tiny_shakespeare", "wiki40b", "wikipedia",
    "wmt14_translate", "xnli")

  def tensorflowDatasets(): Catalog =
    tfdsNames.foldLeft(Catalog(metadata = Map("registry" -> "tensorflow_datasets"))) { (cat, name) =>
      cat.add(name,
        DataRef("tfds", s"tfds:$name", metadata = Map("tfds_name" -> name)),
        "tfds_dataset")
    }
}
